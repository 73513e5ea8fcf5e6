"""Topic administration (SURVEY §2.1 S12 — reference parity:
create_topics.py:10-81, which deletes the two app topics via
kafka-topics.sh and recreates them with KafkaAdminClient/NewTopic).

Two backends behind one interface, the same gated-real + hermetic-twin
pattern the Kafka sources use (streaming/sources.py):

- ``KafkaTopicAdmin`` drives a real broker through kafka-python's
  AdminClient when the library is importable. In this container it is
  not, so the class raises loudly at construction (never silently
  pretends) — the call surface mirrors the reference's admin usage
  one-to-one, so on a cluster with the client installed this is the
  drop-in.
- ``FileTopicAdmin`` administers the FILE-TWIN topics the hermetic
  streaming tests replay through: a topic is a spool directory with a
  ``_topic_meta.json`` manifest (partitions, config). create/delete/
  list/describe have Kafka-like semantics: creating an existing topic
  raises unless ``exist_ok``; deleting removes the directory and its
  chunk files; describe returns the manifest plus the current chunk
  count (the file-twin analog of partition end offsets).

The reference shells out to kafka-topics.sh and sleeps 2 s hoping the
deletion propagated (create_topics.py:30-46). The FILE twin is
synchronous-by-construction (rmtree returns only when the directory is
gone); a REAL broker's delete_topics is asynchronous, so
:func:`reset_topics` handles the propagation window by retrying the
recreate on TopicAlreadyExists until a deadline instead of sleeping a
hoped-for constant.
"""

from __future__ import annotations

import json
import os
import shutil

TOPIC_META = "_topic_meta.json"
DEFAULT_TOPICS = ("transaction_data_topic", "fraud_alerts_topic")


class KafkaTopicAdmin:
    """Real-broker backend (requires kafka-python; absent here)."""

    def __init__(self, bootstrap_servers: str) -> None:
        try:
            from kafka.admin import KafkaAdminClient, NewTopic  # noqa: F401
        except ImportError as exc:  # pragma: no cover - env-dependent
            raise NotImplementedError(
                "kafka-python is not installed in this environment; use "
                "FileTopicAdmin for the hermetic file-twin topics, or run "
                "on a host with the Kafka admin client available"
            ) from exc
        from kafka.admin import KafkaAdminClient

        self._client = KafkaAdminClient(bootstrap_servers=bootstrap_servers)

    def create_topic(
        self, name: str, partitions: int = 3, replication: int = 1,
        exist_ok: bool = False,
    ) -> None:  # pragma: no cover - env-dependent
        from kafka.admin import NewTopic
        from kafka.errors import TopicAlreadyExistsError

        try:
            self._client.create_topics(
                [NewTopic(name, num_partitions=partitions,
                          replication_factor=replication)]
            )
        except TopicAlreadyExistsError:
            if not exist_ok:
                raise

    def delete_topic(self, name: str) -> None:  # pragma: no cover
        self._client.delete_topics([name])

    def list_topics(self) -> list[str]:  # pragma: no cover
        return sorted(self._client.list_topics())


class FileTopicAdmin:
    """Hermetic backend over the file-twin topic layout."""

    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _dir(self, name: str) -> str:
        if "/" in name or name.startswith("."):
            raise ValueError(f"invalid topic name {name!r}")
        return os.path.join(self.root, name)

    def create_topic(
        self, name: str, partitions: int = 3, replication: int = 1,
        exist_ok: bool = False,
    ) -> None:
        d = self._dir(name)
        if os.path.isdir(d):
            if exist_ok:
                return
            raise FileExistsError(f"topic {name!r} already exists")
        os.makedirs(d)
        with open(os.path.join(d, TOPIC_META), "w") as fh:
            json.dump({"partitions": partitions, "replication": replication}, fh)

    def delete_topic(self, name: str) -> None:
        d = self._dir(name)
        if not os.path.isdir(d):
            raise FileNotFoundError(f"topic {name!r} does not exist")
        shutil.rmtree(d)

    def list_topics(self) -> list[str]:
        return sorted(
            n
            for n in os.listdir(self.root)
            if os.path.isfile(os.path.join(self.root, n, TOPIC_META))
        )

    def describe_topic(self, name: str) -> dict:
        d = self._dir(name)
        with open(os.path.join(d, TOPIC_META)) as fh:
            meta = json.load(fh)
        chunks = [f for f in os.listdir(d) if f.endswith(".parquet")]
        return {"name": name, **meta, "n_chunks": len(chunks)}


def reset_topics(
    admin,
    topics: tuple[str, ...] = DEFAULT_TOPICS,
    partitions: int = 3,
    propagation_timeout_sec: float = 15.0,
) -> list[str]:
    """The reference's whole script as one call (create_topics.py:49-81):
    delete-if-exists then recreate each app topic.

    On a real broker ``delete_topics`` is ASYNCHRONOUS — the deletion may
    still be propagating when the recreate lands (the reference sleeps a
    blind 2 s for exactly this, create_topics.py:30-46). The recreate
    therefore retries on TopicAlreadyExists until
    ``propagation_timeout_sec`` elapses; anything else (auth,
    connectivity, a FileExistsError from the synchronous file twin —
    which IS a real conflict) surfaces immediately."""
    import time

    out = []
    for t in topics:
        try:
            admin.delete_topic(t)
        except FileNotFoundError:
            pass  # twin: topic absent — nothing to delete
        except Exception as exc:
            # real broker: absent topic is equally non-fatal; anything
            # else (auth, connectivity) must surface
            if "UnknownTopic" not in type(exc).__name__:
                raise
        deadline = time.monotonic() + propagation_timeout_sec
        while True:
            try:
                admin.create_topic(t, partitions=partitions, exist_ok=False)
                break
            except FileExistsError:
                raise  # file twin deletes synchronously: a genuine conflict
            except Exception as exc:
                still_deleting = "AlreadyExists" in type(exc).__name__
                if not still_deleting or time.monotonic() >= deadline:
                    raise
                time.sleep(0.5)
        out.append(t)
    return out

"""End-to-end CLI test: train -> score -> hermetic stream, the same
three-script workflow a reference user runs (fraud_detection_model.py,
postgres_model_inference.py, spark_streaming_app.py)."""

from __future__ import annotations

import json

import pytest

from real_time_fraud_detection_system_using_big_data_analytics_spark import cli

CSV_HEADER = (
    "step,type,amount,nameOrig,oldbalanceOrg,newbalanceOrig,"
    "nameDest,oldbalanceDest,newbalanceDest,isFraud,isFlaggedFraud"
)


@pytest.fixture()
def paysim_csv(tmp_path):
    rows = [CSV_HEADER]
    for i in range(200):
        fraud = 1 if i % 25 == 0 else 0
        ttype = "TRANSFER" if fraud else ("PAYMENT" if i % 2 else "CASH_IN")
        amount = 250000.0 + i if fraud else 100.0 + i
        rows.append(
            f"{1 + i % 24},{ttype},{amount},C{i},{amount if fraud else 5000.0},"
            f"{0.0 if fraud else 4900.0},{'C' if fraud else 'M'}{i % 7},0.0,0.0,"
            f"{fraud},0"
        )
    p = tmp_path / "tx.csv"
    p.write_text("\n".join(rows))
    return str(p)


def test_cli_train_score_stream(spark, tmp_path, paysim_csv, capsys):
    model_dir = str(tmp_path / "model")
    out_dir = str(tmp_path / "flagged")

    assert cli.main(["train", paysim_csv, "--model-dir", model_dir]) == 0
    train_out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert train_out["metrics"]["n"] > 0
    assert 0.0 <= train_out["metrics"]["auc"] <= 1.0

    # train wrote the readiness marker, so gated scoring proceeds at once
    # (model_ready handshake parity: transaction_producer.py:163-203)
    assert cli.main(
        ["score", paysim_csv, "--model-dir", model_dir, "--out", out_dir,
         "--wait-for-model", "5"]
    ) == 0
    score_out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert score_out["n_scored"] == 200
    assert score_out["n_flagged"] >= 1  # weighted LR must catch the drains

    assert cli.main(["stream", "--events-dir", "/root/testdata/sf0.001"]) == 0
    stream_out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stream_out["alerts"] >= 0


@pytest.mark.parametrize("wait", ["-1", "0"])
def test_cli_score_gated_on_missing_model(tmp_path, capsys, wait):
    """A score pointed at an untrained model dir with a zero-wait gate must
    fail fast with the not-ready error, not a stack trace. 0 means
    check-once (it must NOT silently disable the gate — that regression
    existed when the gate was a plain truthiness test)."""
    rc = cli.main(
        ["score", "/nonexistent.csv", "--model-dir", str(tmp_path / "nope"),
         "--out", str(tmp_path / "out"), "--wait-for-model", wait]
    )
    assert rc == 1
    err = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert err["error"] == "model not ready"


def test_cli_list_run_explain(spark, tmp_path, capsys):
    """The registry-as-a-tool surface: list names, run a query to CSV,
    print a plan."""
    assert cli.main(["list"]) == 0
    listing = capsys.readouterr().out
    assert "* q1_pricing_summary" in listing

    out = str(tmp_path / "q1_out")
    assert cli.main(["run", "q1_pricing_summary", "--out", out]) == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["rows"] > 0 and payload["out"] == out

    assert cli.main(["explain", "q1_pricing_summary", "--mode", "simple"]) == 0
    plan = capsys.readouterr().out
    assert "HashAggregate" in plan

    assert cli.main(["run", "no_such_query"]) == 2


def test_cli_tail_prints_rows(capsys):
    """`tail` (S11 parity, r8): prints the first N ingest rows as JSON
    lines through the same readStream path the app uses."""
    import json as _json

    from real_time_fraud_detection_system_using_big_data_analytics_spark.cli import main

    rc = main(["tail", "-n", "3", "--events-dir", "/root/testdata/sf0.001"])
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 3
    first = _json.loads(lines[0])
    assert {"event_id", "ts", "user_id", "event_type", "value"} <= set(first)


def test_topic_admin_file_twin(tmp_path, capsys):
    """S12 parity (r8): create/describe/list/delete/reset over the
    hermetic file-twin topics, with Kafka-like error semantics."""
    import json as _json

    import pytest as _pytest

    from real_time_fraud_detection_system_using_big_data_analytics_spark.cli import main
    from real_time_fraud_detection_system_using_big_data_analytics_spark.streaming.topics import (
        FileTopicAdmin,
        reset_topics,
    )

    root = str(tmp_path / "topics")
    assert main(["topics", "create", "--topic", "t1", "--dir", root]) == 0
    assert main(["topics", "list", "--dir", root]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert _json.loads(out[-1]) == {"topics": ["t1"]}

    admin = FileTopicAdmin(root)
    with _pytest.raises(FileExistsError):
        admin.create_topic("t1")
    admin.create_topic("t1", exist_ok=True)  # idempotent form
    assert admin.describe_topic("t1")["partitions"] == 3
    with _pytest.raises(FileNotFoundError):
        admin.delete_topic("missing")

    # the reference script's delete-then-recreate, as one call
    created = reset_topics(admin)
    assert created == ["transaction_data_topic", "fraud_alerts_topic"]
    assert set(admin.list_topics()) == {"t1", *created}


def test_topic_admin_kafka_backend_gated():
    """The real-broker backend must raise loudly when kafka-python is
    absent — never silently no-op (same seam rule as the codecs)."""
    import pytest as _pytest

    from real_time_fraud_detection_system_using_big_data_analytics_spark.streaming.topics import (
        KafkaTopicAdmin,
    )

    with _pytest.raises(NotImplementedError):
        KafkaTopicAdmin("localhost:9092")

from .codec import attach_binary_payload, decode_image_features, sample_frames

__all__ = ["attach_binary_payload", "decode_image_features", "sample_frames"]

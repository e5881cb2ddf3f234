from deep_insight_face_tpu.data.pairs import (  # noqa: F401
    Match,
    Mismatch,
    generate_pairs,
    read_pairs,
    resolve_pair_paths,
    transform_to_lfw_format,
    write_pairs,
)

__all__ = [
    "Match",
    "Mismatch",
    "generate_pairs",
    "read_pairs",
    "resolve_pair_paths",
    "transform_to_lfw_format",
    "write_pairs",
]

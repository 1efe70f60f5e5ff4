from . import (  # noqa: F401
    asof,
    contingency,
    dedup,
    drugmap,
    filters,
    flatten,
    meddra,
    montecarlo,
    multimodal,
    sampling,
    similarity,
)

"""cudasw4_tpu — TPU-native Smith-Waterman protein database search.

A from-scratch JAX/Pallas re-design of the capabilities of CUDASW++ 4.0
(asbschmidt/CUDASW4): `makedb`-compatible database preprocessing, affine-gap
local alignment of protein queries against length-bucketed packed databases,
top-N score reporting, and database sharding across TPU meshes.
"""

from .constants import ALPHABET_SIZE, AMINO_ACIDS, UNKNOWN, decode, encode
from .substitution import (
    MATRICES_20,
    MATRICES_FULL,
    BlosumType,
    ScoringConfig,
    make_scoring_config,
)

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy top-level conveniences: importing the engine pulls in jax,
    # which pure-host uses (makedb on a CPU box) should not pay for.
    if name == "SearchEngine":
        from .engine import SearchEngine

        return SearchEngine
    if name == "load_db":
        from .db.format import load_db

        return load_db
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

__all__ = [
    "ALPHABET_SIZE",
    "AMINO_ACIDS",
    "UNKNOWN",
    "encode",
    "decode",
    "BlosumType",
    "ScoringConfig",
    "make_scoring_config",
    "MATRICES_20",
    "MATRICES_FULL",
    "__version__",
]

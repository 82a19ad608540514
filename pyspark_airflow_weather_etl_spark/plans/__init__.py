"""Query catalog — importing this package populates the registry."""

from . import (  # noqa: F401
    relational,
    simplans,
    sqlplans,
    statplans,
    streamplans,
    temporal,
    textplans,
)
from .registry import REGISTRY, oracles, queries  # noqa: F401

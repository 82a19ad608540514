"""Query catalog — importing this package populates the registry."""

from . import relational, simplans, streamplans, textplans  # noqa: F401
from .registry import REGISTRY, oracles, queries  # noqa: F401

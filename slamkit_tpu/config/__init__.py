from .node import ConfigNode, ConfigList, MISSING, MissingMandatoryValue, to_container
from .compose import compose, main

__all__ = [
    "ConfigNode",
    "ConfigList",
    "MISSING",
    "MissingMandatoryValue",
    "to_container",
    "compose",
    "main",
]

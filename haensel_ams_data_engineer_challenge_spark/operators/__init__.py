from .asof import asof_join, journey_asof_join
from .components import connected_components, dedup_survivors
from .ihc import flag_conversion_session, ihc_attribute

__all__ = [
    "asof_join",
    "journey_asof_join",
    "connected_components",
    "dedup_survivors",
    "flag_conversion_session",
    "ihc_attribute",
]

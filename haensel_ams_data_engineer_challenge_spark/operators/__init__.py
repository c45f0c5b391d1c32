from .asof import asof_join, journey_asof_join
from .components import connected_components, dedup_survivors
from .ihc import flag_conversion_session, ihc_attribute
from .sampling import hash_split, stratum_cap, weighted_interleave

__all__ = [
    "asof_join",
    "journey_asof_join",
    "connected_components",
    "dedup_survivors",
    "hash_split",
    "stratum_cap",
    "weighted_interleave",
    "flag_conversion_session",
    "ihc_attribute",
]

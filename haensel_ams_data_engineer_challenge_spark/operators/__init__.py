from .asof import asof_join, journey_asof_join
from .ihc import flag_conversion_session, ihc_attribute

__all__ = [
    "asof_join",
    "journey_asof_join",
    "flag_conversion_session",
    "ihc_attribute",
]

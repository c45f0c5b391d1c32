"""Shared gate-arm sizing constants (dependency-free on purpose:
binary.py builds MULTIMODAL_BOTH_SQL at module scope by importing
phash/audioembed/videoembed, so any top-level cross-import among those
four cycles — sizing knobs live here instead)."""

#: round 14 (r13 verdict task 1): the five REAL-codec sample-tier gate
#: arms (phash PNG, jpeg, gif, audio_embed, video_embed) synthesize and
#: fully decode one payload per id — per-payload cost is intrinsic
#: Python codec CPU that scales linearly with the id count, so the gate
#: certifies each codec on a 1-in-MOD id sample instead of the whole
#: corpus (1250 payloads per arm at sf0.1 instead of 5000).  Every
#: oracle twin carries the same ``doc_id % MOD = 0`` predicate, so the
#: hash gate is unchanged in kind — only the certified sample is
#: smaller; the cheap stub/header arms still cover every corpus row.
SAMPLE_ARM_MOD = 4

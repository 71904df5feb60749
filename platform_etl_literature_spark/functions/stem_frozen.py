"""Frozen Porter-stem lookup (the build-once artifact).

(token -> stem) pairs for every label token the derived literature
corpus and its entity LUTs can send through the Porter stage, built
ONCE by tools/build_frozen_stems.py from the fixture entity tables
(sf0.001/sf0.01/sf0.1 union) with the production stemmer
(functions/porter.py) — only pairs where the stem DIFFERS from the
token are frozen; both Spark (functions.text.frozen_stem_terms) and
the DuckDB oracle COALESCE unseen tokens to identity, so the frozen
pipeline is deterministic and engine-identical at any scale factor by
construction.  Regenerate after a fixture change.

STEM_FROZEN = [(token, stem), ...] sorted by token.
"""

STEM_FROZEN: list[tuple[str, str]] = [
    ('large', 'larg'),
]

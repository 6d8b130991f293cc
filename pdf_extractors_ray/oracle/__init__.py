"""Reference-semantics oracle.

Pure, single-threaded Python reimplementations of the extraction semantics
of ShahzadAmjadKhan/pdf-extractors (studied at ``/root/reference``; file:line
citations in each module). These functions serve two purposes:

1. they ARE the per-conversation fold cores that the distributed Ray Data
   pipelines call inside ``groupby(conv_id).map_groups`` (so the distributed
   result is per-turn identical to the oracle by construction, provided the
   engine restores ordering, grouping and state correctly — which is exactly
   what the tests check), and
2. run standalone over an ordered transcript they produce the golden outputs
   the engine is compared against (SURVEY.md §5.2).

Every function is deterministic: no wall-clock, no ``set`` iteration order
escapes (list dedup is canonicalized as ``sorted(set(...))`` — documented
divergence from the reference's hash-ordered ``list(set(...))``,
``mobil-oil/mobil-oil-extractor.py:54``; see SURVEY.md §7.5).
"""

from . import catalog, census, grid, invoice, layout, persons, table  # noqa: F401

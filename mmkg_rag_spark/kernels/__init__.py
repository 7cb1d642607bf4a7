"""Pure-Python parity kernels.

These functions replicate — with identical semantics, verified by ported golden
tests — the reference's pure functions (mmkg-rag ``index/parser.py``,
``index/text.py``, ``index/deduplicate.py``, ``index/mmodal.py``,
``utils/helper.py``). They are dependency-free (stdlib only) so they can run
inside Arrow-batched pandas UDFs on executors without shipping extra wheels.
"""

from .records import Entity, Relation, Image, Chunk  # noqa: F401
from .similarity import ratio, token_sort_ratio, token_set_ratio, token_ratio  # noqa: F401

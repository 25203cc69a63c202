"""Pure per-document kernels (numpy only, no Ray imports).

These implement the reference engine's table-reconstruction semantics
exactly (see SURVEY.md §2 for the operator inventory and the
``file:line`` citations into ``/root/reference``), re-expressed as
vectorized/struct-of-array kernels that run inside Ray Data
``map_batches`` stages.
"""

from .doc import TokenSOA
from .layouts import extract_document, DocResult

__all__ = ["TokenSOA", "extract_document", "DocResult"]

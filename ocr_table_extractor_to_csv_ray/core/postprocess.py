"""Financial-row post-processing (reference ``postprocess.py:18-61``).

An ordered per-document scan (state never crosses documents): footer
legend rows are dropped, section rows (ending ``:``) reset the running
section and keep only their text, value-only rows get a synthesized
``Total <section>`` / ``Subtotal`` label, and lone dashes normalize to 0.
"""

from __future__ import annotations

import re
from typing import List

from .numeric import is_number_like

SECTION_RE = re.compile(r":\s*$")
FOOTER_RE = re.compile(r"las notas adjuntas", re.IGNORECASE)


def fill_missing_labels_and_clean(
    rows: List[List[str]],
    label_for_subtotals: bool = True,
    normalize_dash_zero: bool = True,
) -> List[List[str]]:
    clean: List[List[str]] = []
    last_section = ""
    for cells in rows:
        a, v1, v2 = (list(cells) + ["", "", ""])[:3]
        text = (a or "").strip()

        if FOOTER_RE.search(text):
            continue

        if SECTION_RE.search(text):
            last_section = text.rstrip(":").strip()
            clean.append([text, "", ""])      # section rows keep no values
            continue

        if label_for_subtotals and not text and is_number_like(v1) and is_number_like(v2):
            a = f"Total {last_section}" if last_section else "Subtotal"

        if normalize_dash_zero:
            if v1 and v1.strip() == "-":
                v1 = "0"
            if v2 and v2.strip() == "-":
                v2 = "0"

        clean.append([a, v1, v2])
    return clean

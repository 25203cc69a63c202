"""Unit tests pinning the reference quirks that are contract
(SURVEY.md §7.0) — each cites the reference file:line it preserves."""

from __future__ import annotations

import numpy as np

from ocr_table_extractor_to_csv_ray.core.doc import TokenSOA
from ocr_table_extractor_to_csv_ray.core.geometry import (
    build_lines, estimate_columns, overlap_ratio, valley_cuts,
)
from ocr_table_extractor_to_csv_ray.core.gridpro import (
    find_header_row_index, professional_grid,
)
from ocr_table_extractor_to_csv_ray.core.numeric import (
    is_num_span, is_number_like, is_numeric_token, to_number,
)
from ocr_table_extractor_to_csv_ray.core.postprocess import (
    fill_missing_labels_and_clean,
)
from ocr_table_extractor_to_csv_ray.core.records import (
    Record, detect_header_row, merge_financial_rows, merge_lines_into_rows,
)


def T(*rows):
    return TokenSOA.from_lists(rows)


class TestNumericGrammars:
    def test_f1_matches_empty_and_symbols(self):
        # column_model.py:8-11 — every part optional
        for s in ["", "-", "$", "(", "1,234", "$1,234.56", "(57,519)", "246", "1 234"]:
            assert is_num_span(s), s
        assert not is_num_span("abc")
        assert not is_num_span("12a")

    def test_f2_requires_digit(self):
        # assign_financial.py:8-18
        assert is_numeric_token("-")
        assert is_numeric_token("$ 101,606")
        assert is_numeric_token("(57,519)")
        assert not is_numeric_token("")
        assert not is_numeric_token("$")

    def test_f3_number_like(self):
        assert is_number_like("-")
        assert is_number_like(" 1,234 ")
        assert not is_number_like("")
        assert not is_number_like("x1")

    def test_to_number_paren_quirk(self):
        # exporters.py:14-34 — ')' survives stripping, float() fails,
        # parenthesized negatives fall back to the ORIGINAL text
        assert to_number("(57,519)") == "(57,519)"
        assert to_number("$1,234.56") == "1234.56"
        assert to_number("-") == "0"
        assert to_number("1,234") == "1234"
        assert to_number("12.0") == "12"
        assert to_number("  ") == ""
        assert to_number("texto") == ""        # stripping leaves nothing
        assert to_number("1.2.3x") == "1.2.3x"  # unparseable → original text


class TestLines:
    def test_overlap_half_boundary_merges(self):
        # lines.py:46 — ratio >= 0.5 merges; denominator is min length
        assert overlap_ratio(0, 10, 5, 15) == 0.5
        toks = T(("a", 1, 0, 0, 10, 10), ("b", 1, 20, 5, 30, 15))
        lines = build_lines(toks)
        assert len(lines) == 1  # exactly 0.5 → same line

    def test_band_expansion(self):
        # the y-band grows as tokens join (lines.py:47-48)
        toks = T(("a", 1, 0, 0, 10, 10), ("b", 1, 20, 5, 30, 15), ("c", 1, 40, 10, 50, 20))
        # band is (0,15) after a+b; c overlaps 5 of its 10 px → exactly 0.5 → joins
        assert len(build_lines(toks)) == 1

    def test_page_break_closes_line(self):
        toks = T(("a", 1, 0, 0, 10, 10), ("b", 2, 0, 0, 10, 10))
        assert len(build_lines(toks)) == 2

    def test_line_id_grouping_and_inferred_key(self):
        # lines.py:14-26 — one token with an id switches the whole doc
        toks = T(("a", 1, 0, 0, 10, 10, "L1"), ("b", 1, 20, 0, 30, 10, None))
        lines = build_lines(toks)
        assert len(lines) == 2  # 'b' lands in its own inferred group


class TestColumns:
    def test_valley_threshold_strict(self):
        # columns.py:38 — a 5-px valley is NOT a separator; 6 px is
        def cols(gap):
            toks = T(("a", 1, 0, 0, 30, 10), ("b", 1, 30 + gap, 0, 70 + gap, 10))
            return estimate_columns(build_lines(toks), toks)

        assert len(cols(5)) == 1
        assert len(cols(6)) == 2

    def test_min_col_width_drops_narrow(self):
        # columns.py:44-48 — interval narrower than 25 px is dropped
        toks = T(("a", 1, 0, 0, 10, 10), ("b", 1, 20, 0, 60, 10))
        iv = estimate_columns(build_lines(toks), toks)
        assert iv == [(14, 60)]  # left interval (0,14) is under 25 px → dropped

    def test_expected_n_cols_merge_and_split(self):
        toks = T(("a", 1, 0, 0, 40, 10), ("b", 1, 100, 0, 140, 10), ("c", 1, 300, 0, 340, 10))
        lines = build_lines(toks)
        assert len(estimate_columns(lines, toks)) == 3
        assert len(estimate_columns(lines, toks, expected_n_cols=2)) == 2
        assert len(estimate_columns(lines, toks, expected_n_cols=5)) == 5

    def test_no_gap_single_interval(self):
        toks = T(("a", 1, 0, 0, 30, 10), ("b", 1, 30, 0, 60, 10))
        assert estimate_columns(build_lines(toks), toks) == [(0, 60)]


class TestRows:
    def test_out_of_interval_record_dropped(self):
        # rows.py:54-61 — no nearest fallback
        toks = T(("a", 1, 0, 0, 100, 20), ("b", 1, 0, 100, 100, 120))
        lines = build_lines(toks)
        # a record whose center is inside no interval vanishes
        recs = [
            Record(1, 0, 20, ["a"]),
            Record(1, 100, 120, ["b"]),
            Record(1, 2000, 2002, ["ghost"]),
        ]
        rows = merge_lines_into_rows(recs, lines, toks)
        flat = [c for r in rows for c in r]
        assert "ghost" not in flat

    def test_never_merge_two_value_lines(self):
        # rows.py:110-115
        recs = [
            Record(1, 0, 10, ["a", "1", ""], num_count=1),
            Record(1, 12, 22, ["b", "2", ""], num_count=1),
        ]
        assert len(merge_financial_rows(recs)) == 2

    def test_label_wrap_merges(self):
        recs = [
            Record(1, 0, 10, ["Cuentas", "1", ""], num_count=1),
            Record(1, 12, 22, ["por cobrar", "", ""], num_count=0),
        ]
        rows = merge_financial_rows(recs)
        assert rows == [["Cuentas por cobrar", "1", ""]]

    def test_label_then_values_merges_first_wins(self):
        recs = [
            Record(1, 0, 10, ["Efectivo", "", ""], num_count=0),
            Record(1, 12, 22, ["", "9", "8"], num_count=2),
        ]
        assert merge_financial_rows(recs) == [["Efectivo", "9", "8"]]

    def test_header_regex_pulls_later_row(self):
        # rows.py:148-160 — matching row 2 moves ahead; earlier rows join body
        rows = [["x", "y"], ["Concepto", "Saldo"], ["a", "1"]]
        hdr, body = detect_header_row(rows, ["concepto"])
        assert hdr == ["Concepto", "Saldo"]
        assert body == [["x", "y"], ["a", "1"]]

    def test_header_default_first_row(self):
        rows = [["h1", "h2"], ["a", "1"]]
        hdr, body = detect_header_row(rows)
        assert hdr == ["h1", "h2"] and body == [["a", "1"]]


class TestPostprocess:
    def test_footer_dropped_section_resets(self):
        rows = [
            ["Activo circulante:", "1", "2"],
            ["", "10", "20"],
            ["las notas adjuntas son", "", ""],
            ["", "-", "5"],
        ]
        out = fill_missing_labels_and_clean(rows)
        assert out[0] == ["Activo circulante:", "", ""]   # section keeps no values
        assert out[1] == ["Total Activo circulante", "10", "20"]
        assert len(out) == 3                               # footer gone
        assert out[2] == ["Total Activo circulante", "0", "5"]  # dash→0

    def test_subtotal_without_section(self):
        out = fill_missing_labels_and_clean([["", "1", "2"]])
        assert out == [["Subtotal", "1", "2"]]


class TestProfessional:
    def test_header_index_minus_one_duplicates_body(self):
        # grid_builder.py:65-81,145-152 — -1 treated as an index: the
        # LAST row becomes the header, body duplicates rows
        assert find_header_row_index([["", "x"], ["", "y"]]) == -1
        toks = T(("solo", 1, 0, 0, 40, 10))   # single column → no header match
        header, body = professional_grid(toks)
        assert header == ["solo"]

    def test_hierarchy_prefix(self):
        toks = T(
            ("Padre", 1, 100, 0, 160, 20),
            ("hijo", 1, 180, 40, 230, 60),
            ("9", 1, 1500, 40, 1520, 60),
        )
        header, body = professional_grid(toks)
        # header row is ["Padre","",""] but hierarchy depth 1 blanks its
        # leading cell (grid_builder.py:150-152); the child row gains the
        # parent prefix and is then TRUNCATED to header width
        # (grid_builder.py:163-165) — '9' falls off.  Reference quirks.
        assert header == ["", "", ""]
        assert body == [["Padre", "", "hijo"]]


class TestValleyCuts:
    def test_matches_naive_profile(self):
        rng = np.random.default_rng(7)
        for _ in range(50):
            n = int(rng.integers(1, 30))
            s = rng.integers(0, 500, n)
            e = s + rng.integers(0, 80, n)
            lo, hi = int(s.min()), int(e.max())
            # naive reference-style profile
            if hi - lo <= 0:
                continue
            prof = np.zeros(hi - lo, dtype=int)
            for a, b in zip(s, e):
                prof[a - lo:b - lo] += 1
            zeros = np.where(prof == 0)[0]
            if len(zeros) == 0:
                assert valley_cuts(s, e, lo, hi, 3) is None
                continue
            gaps = np.split(zeros, np.where(np.diff(zeros) != 1)[0] + 1)
            expect = [lo + int(g.mean()) for g in gaps if len(g) > 3]
            assert valley_cuts(s, e, lo, hi, 3) == expect

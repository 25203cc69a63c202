"""HTML main-content extraction: boilerplate strip, tables, spans."""

from __future__ import annotations

import pyarrow as pa

from ocr_table_extractor_to_csv_ray.core.spans import spans_to_grid
from ocr_table_extractor_to_csv_ray.sources.html import (
    extract_main_content, html_main_text_batch, html_tables_batch,
    make_html_page)


TABLE = [["Concepto", "Valor"], ["Caja", "1,234"], ["Bancos", "5,678"]]


def test_boilerplate_stripped():
    page = make_html_page("d1", "Real content paragraph one.\nSecond paragraph.",
                          with_boilerplate=True)
    r = extract_main_content(page)
    assert "Real content paragraph one." in r["text"]
    assert "menu item" not in r["text"]          # nav container skipped
    assert "share" not in r["text"]              # link-dense block dropped
    assert "terms" not in r["text"]              # footer skipped
    assert "tracking" not in r["text"]           # script skipped
    assert r["title"] == "Doc d1"


def test_tables_extracted_as_grids():
    page = make_html_page("d2", "body", table=TABLE)
    r = extract_main_content(page)
    assert r["tables"] == [TABLE]
    # table cell text must not leak into main text
    assert "1,234" not in r["text"]


def test_nested_table_cells_and_multiple_tables():
    html = ("<body><table><tr><th>A</th></tr><tr><td><b>x</b> y</td></tr></table>"
            "<table><tr><td>only</td></tr></table></body>")
    r = extract_main_content(html)
    assert r["tables"] == [[["A"], ["x y"]], [["only"]]]


def test_html_batches():
    pages = [make_html_page(f"d{i}", f"text {i}", table=TABLE if i % 2 else None)
             for i in range(4)]
    batch = pa.table({"doc_id": pa.array([f"d{i}" for i in range(4)]),
                      "html": pa.array(pages)})
    main = html_main_text_batch(batch)
    assert main["n_tables"].to_pylist() == [0, 1, 0, 1]
    assert all(t.startswith("Doc ") for t in main["title"].to_pylist())

    tables = html_tables_batch(batch)
    assert tables.num_rows == 2
    header, rows = spans_to_grid([
        (s["kind"], s["text"], s["media_ref"], s["offset"])
        for s in tables["spans"].to_pylist()[0]])
    assert header == TABLE[0] and rows == TABLE[1:]


def test_empty_and_malformed():
    assert extract_main_content("")["text"] == ""
    assert extract_main_content("<p>unclosed")["text"] == ""  # never-closed block dropped
    r = extract_main_content("<table><tr><td>a</table>done")
    assert r["tables"] == [[["a"]]]

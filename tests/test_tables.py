"""Table structure recovery tests."""

import numpy as np

from ocr_system_tpu.extract.tables import extract_table_fields, find_tables


def _word(text, x, y, w=40, h=12, page=1):
    return {
        "type": "word",
        "content": text,
        "confidence": 0.95,
        "polygon": [x, y, x + w, y, x + w, y + h, x, y + h],
        "page_number": page,
    }


def make_grid(cols_x=(50, 200, 350), rows_y=(100, 130, 160, 190)):
    boxes = []
    for r, y in enumerate(rows_y):
        for c, x in enumerate(cols_x):
            boxes.append(_word(f"r{r}c{c}", x, y))
    return boxes


class TestFindTables:
    def test_detects_simple_grid(self):
        tables = find_tables(make_grid())
        assert len(tables) == 1
        t = tables[0]
        assert t.n_rows == 4 and t.n_cols == 3
        assert len(t.cells) == 12
        texts = {(c.row, c.col): c.text for c in t.cells}
        assert texts[(0, 0)] == "r0c0"
        assert texts[(3, 2)] == "r3c2"

    def test_markdown_render(self):
        t = find_tables(make_grid())[0]
        md = t.to_markdown()
        lines = md.splitlines()
        assert lines[0] == "| r0c0 | r0c1 | r0c2 |"
        assert lines[1].startswith("| ---")
        assert len(lines) == 5  # header + sep + 3 rows

    def test_non_grid_text_not_a_table(self):
        # ragged paragraph: x-starts jitter widely row to row
        rng = np.random.default_rng(0)
        boxes = []
        for r in range(5):
            x = float(rng.integers(10, 400))
            boxes.append(_word(f"line{r}", x, 100 + r * 30, w=300))
        assert find_tables(boxes) == []

    def test_prose_above_table_excluded(self):
        boxes = [
            _word("Some", 10, 20), _word("title", 120, 20),
            *make_grid(rows_y=(100, 130, 160)),
        ]
        tables = find_tables(boxes)
        assert len(tables) == 1
        assert tables[0].n_rows == 3

    def test_layout_box_shape(self):
        t = find_tables(make_grid())[0]
        box = t.to_layout_box()
        assert box["type"] == "table"
        assert len(box["polygon"]) == 8
        assert box["row_count"] == 4 and box["column_count"] == 3

    def test_multiword_cells_merged(self):
        boxes = make_grid(cols_x=(50, 250))
        # add a second word inside row-0 col-0's cell span
        boxes.append(_word("extra", 95, 100))
        t = find_tables(boxes)[0]
        texts = {(c.row, c.col): c.text for c in t.cells}
        assert texts[(0, 0)] == "r0c0 extra"

    def test_empty(self):
        assert find_tables([]) == []


def test_extract_table_fields():
    tables = find_tables(make_grid())
    fields = extract_table_fields(tables)
    assert len(fields) == 1
    assert fields[0].field_type == "table"
    assert "r0c0" in fields[0].field_value

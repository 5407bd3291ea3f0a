"""pdf_reading_order: jumble-invariance and exact token regrouping."""

import pyarrow as pa

from rayextract.pdf_layout import (
    extract_reading_order,
    reading_order_batch,
    synth_dump,
)


def test_synth_dump_roundtrip_identity():
    for doc_id in (0, 1, 7, 96, 997):
        for n in (0, 1, 3, 4, 8, 9, 19, 40, 41):
            text = " ".join(f"tok{i}" for i in range(n))
            dump, n_frags, n_lines = synth_dump(doc_id, text)
            want = "\n".join(
                " ".join(text.split()[i * 8 : i * 8 + 8])
                for i in range((n + 7) // 8)
            )
            assert extract_reading_order(dump) == want, (doc_id, n)
            assert n_frags == (n + 3) // 4
            assert n_lines == (n + 7) // 8


def test_reading_order_batch_columns():
    t = pa.table({"doc_id": pa.array([5, 6], pa.int64()),
                  "text": pa.array(["a b c d e f g h i", None], pa.string())})
    out = reading_order_batch(t).to_pydict()
    assert out["extracted"][0] == "a b c d e f g h\ni"
    assert out["n_frags"][0] == 3 and out["n_lines"][0] == 2
    assert out["extracted"][1] == "" and out["n_frags"][1] == 0

"""ContentParserSink contract: fused sink writes are idempotent under task
retry (same batch -> same file name, byte-identical content, no duplicate
rows) and the returned narrow table matches ContentParser's projection."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from rayextract.config import ExtractConfig
from rayextract.stages import ContentParser, ContentParserSink


def _batch():
    return pa.table(
        {
            "conv_id": pa.array(["c1", "c1", "c2"], pa.string()),
            "turn_idx": pa.array([0, 1, 0], pa.int64()),
            "text": pa.array(
                ["hello INVOICE NO : AB1234", "<p>Hi</p><script>x</script>", None],
                pa.string(),
            ),
        }
    )


def test_retry_idempotent(tmp_path):
    d = str(tmp_path / "turns")
    sink = ContentParserSink(ExtractConfig(), sink_dir=d)
    narrow1 = sink(_batch())
    files1 = sorted(os.listdir(d))
    sizes1 = [os.path.getsize(os.path.join(d, f)) for f in files1]
    rows1 = pq.read_table(d).num_rows

    # a retried task re-executes the same batch: same file, same bytes
    narrow2 = sink(_batch())
    files2 = sorted(os.listdir(d))
    assert files1 == files2 and len(files1) == 1
    assert [os.path.getsize(os.path.join(d, f)) for f in files2] == sizes1
    assert pq.read_table(d).num_rows == rows1 == 3
    assert narrow1.equals(narrow2)


def test_narrow_projection_matches_parser(tmp_path):
    d = str(tmp_path / "turns")
    cfg = ExtractConfig()
    full = ContentParser(cfg)(_batch())
    narrow = ContentParserSink(cfg, sink_dir=d)(_batch())
    assert narrow.column_names == ContentParserSink.FOLD_COLUMNS
    assert narrow.equals(full.select(ContentParserSink.FOLD_COLUMNS))
    # the sunk file carries the FULL schema
    assert pq.read_table(d).column_names == full.column_names


def test_distinct_batches_distinct_files(tmp_path):
    d = str(tmp_path / "turns")
    sink = ContentParserSink(ExtractConfig(), sink_dir=d)
    sink(_batch())
    b2 = pa.table(
        {
            "conv_id": pa.array(["c3"], pa.string()),
            "turn_idx": pa.array([0], pa.int64()),
            "text": pa.array(["other"], pa.string()),
        }
    )
    sink(b2)
    assert len(os.listdir(d)) == 2
    assert pq.read_table(d).num_rows == 4


def test_empty_batch_writes_nothing(tmp_path):
    d = str(tmp_path / "turns")
    sink = ContentParserSink(ExtractConfig(), sink_dir=d)
    empty = _batch().slice(0, 0)
    out = sink(empty)
    assert len(out) == 0 and out.column_names == ContentParserSink.FOLD_COLUMNS
    assert os.listdir(d) == []

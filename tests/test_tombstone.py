"""tombstone_delete_audit: feed membership, counts, and XOR fingerprint."""

import hashlib

import numpy as np
import pandas as pd

from rayextract.queries import tombstone_delete_audit

SF = "/root/testdata/sf0.001"


def _h64(i: int) -> int:
    return int.from_bytes(hashlib.md5(str(i).encode()).digest()[:8], "little")


def test_tombstone_audit_matches_bruteforce(ray_session):
    got = (
        tombstone_delete_audit(SF)
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "source"])
    rows = []
    for src, g in docs.groupby("source"):
        ids = [int(x) for x in g["doc_id"]]
        deleted = [i for i in ids if _h64(i) % 97 == 0]
        kept = [i for i in ids if _h64(i) % 97 != 0]
        fp = 0
        for i in kept:
            fp ^= _h64(i) >> 1
        rows.append((src, len(ids), len(deleted), len(kept), fp))
    want = pd.DataFrame(
        rows, columns=["source", "n_docs", "n_deleted", "n_kept", "kept_fp"]
    )
    assert got["source"].tolist() == want["source"].tolist()
    for c in ["n_docs", "n_deleted", "n_kept", "kept_fp"]:
        assert (got[c].to_numpy(dtype=np.int64)
                == want[c].to_numpy(dtype=np.int64)).all(), c
    # the audit must actually tombstone something at this scale
    assert int(got["n_deleted"].sum()) > 0

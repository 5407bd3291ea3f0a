"""Batch-level stages for the transcript pipeline.

``ContentParser`` is the D2/D4-analog stateful stage: one instance per actor
process (regexes/parser tables/gazetteers built once in ``__init__``, the
reference loads Tesseract + CRF once per worker at Worker.cs:61-95), then
``__call__`` per Arrow batch. Everything that can be vectorized is done with
pyarrow.compute; per-row Python runs only for (a) non-plain payload decoding
and (b) candidate extraction on keyword-gated rows — the same rows the
reference runs its expensive stages on (Worker.cs:216-220).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .config import ExtractConfig
from .decode import safe_decode
from .extractors import candidates_for_turn
from .schema import SPAN_TYPE
from .textnorm import keyword_mask, remove_special_array, upper_invariant_array

CANDIDATE_TYPE = pa.struct(
    [("field", pa.string()), ("value", pa.string()), ("start", pa.int32()), ("end", pa.int32())]
)

# span label per extractor field
_FIELD_LABEL = {
    "patient_name": "PERSON",
    "patient_birthdate": "DATE",
    "invoice_number": "INVOICE_NUM",
    "invoice_date": "DATE",
    "order_number": "ORDER_NUM",
    "gross_total": "MONEY",
    "vendor_name": "ORG",
}


class ContentParser:
    """text -> kind, extracted_text, clean_text, confidence, spans,
    candidates (clean_upper is computed in-flight for gates/extractors but
    not emitted — derivable as upper_invariant(clean_text), and the third
    text copy cost ~20% of headline wall at 32 cpus). Use with
    ``ds.map_batches(ContentParser, fn_constructor_kwargs={"cfg": cfg},
    batch_format="pyarrow", batch_size=B, concurrency=N)``.
    """

    def __init__(self, cfg: ExtractConfig | None = None):
        self.cfg = cfg or ExtractConfig()
        self._patient_keys = self.cfg.patient_keys_upper()
        self._invoice_keys = self.cfg.invoice_keys_upper()

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n = len(text)

        # ---- kind routing (vectorized; null text rows route as plain) ----
        pdfish = pc.fill_null(
            pc.starts_with(pc.utf8_ltrim_whitespace(text), "<<x:"), False
        )
        htmlish = pc.and_(
            pc.starts_with(pc.utf8_ltrim_whitespace(text), "<"),
            pc.match_substring(text, "</"),
        )
        htmlish = pc.fill_null(pc.and_(htmlish, pc.invert(pdfish)), False)
        pdf_np = pdfish.to_numpy(zero_copy_only=False).astype(bool)
        html_np = htmlish.to_numpy(zero_copy_only=False).astype(bool)

        # ---- decode non-plain payloads (Python only on flagged rows; the
        # patched-in result is vectorized — no full-column python round trip).
        # A throwing payload is quarantined: empty text + parse_error string
        # (reference per-page try/catch, Worker.cs:117-125; see decode.py)
        special = np.flatnonzero(pdf_np | html_np)
        errors: list[tuple[int, str]] = []
        if special.size:
            raw_special = text.take(pa.array(special, pa.int64())).to_pylist()
            decoded = []
            for i, s in zip(special, raw_special):
                if s is None:
                    decoded.append(None)
                    continue
                out, err = safe_decode(s, "pdfish" if pdf_np[i] else "html")
                decoded.append(out)
                if err is not None:
                    errors.append((int(i), err))
            mask = np.zeros(n, dtype=bool)
            mask[special] = True
            extracted = pc.replace_with_mask(
                text, pa.array(mask), pa.array(decoded, pa.string())
            )
        else:
            extracted = text
        parse_error: pa.Array
        if errors:
            err_vals = np.full(n, None, dtype=object)
            for i, msg in errors:
                err_vals[i] = msg
            parse_error = pa.array(err_vals, pa.string())
        else:
            parse_error = pa.nulls(n, pa.string())

        kind = np.where(pdf_np, "pdfish", np.where(html_np, "html", "plain"))

        # ---- normalize (vectorized F1/F2) -------------------------------
        clean = remove_special_array(extracted)
        upper = upper_invariant_array(clean)
        if isinstance(clean, pa.ChunkedArray):
            clean = clean.combine_chunks()
        if isinstance(upper, pa.ChunkedArray):
            upper = upper.combine_chunks()

        # per-turn confidence (A1 input): kept-char ratio of normalization
        ext_len = pc.utf8_length(extracted).cast(pa.float64())
        clean_len = pc.utf8_length(clean).cast(pa.float64())
        conf = pc.fill_null(
            pc.if_else(
                pc.greater(ext_len, 0.0),
                pc.multiply(
                    pc.divide(clean_len, pc.max_element_wise(ext_len, 1.0)), 100.0
                ),
                pa.scalar(0.0),
            ),
            0.0,  # null text rows: confidence 0, never a null that skews A1 counts
        )

        # ---- keyword gate (F3, vectorized) ------------------------------
        gate = pc.fill_null(
            pc.or_(
                keyword_mask(upper, self._patient_keys) if self.cfg.extract_patient
                else pc.equal(pc.utf8_length(upper), -1),
                keyword_mask(upper, self._invoice_keys) if self.cfg.extract_invoice
                else pc.equal(pc.utf8_length(upper), -1),
            ),
            False,
        ).to_numpy(zero_copy_only=False)
        if self.cfg.vendor_lookup:
            gate = gate | np.ones(n, dtype=bool)  # vendor equality needs every row

        # ---- candidates + spans on gated rows only ----------------------
        gate_idx = np.flatnonzero(gate)
        take_idx = pa.array(gate_idx, pa.int64())
        conv_gated = batch.column("conv_id").take(take_idx).to_pylist()
        upper_gated = upper.take(take_idx).to_pylist()
        cands: list[list[dict]] = [[] for _ in range(n)]
        spans: list[list[dict]] = [[] for _ in range(n)]
        for i, conv_i, t in zip(gate_idx, conv_gated, upper_gated):
            if not t:
                continue
            for field, value, start, end in candidates_for_turn(
                conv_i, t, self.cfg,
                patient_keys=self._patient_keys, invoice_keys=self._invoice_keys,
            ):
                cands[i].append(
                    {"field": field, "value": value, "start": start, "end": end}
                )
                spans[i].append(
                    {
                        "label": _FIELD_LABEL.get(field, field.upper()),
                        "start": start,
                        "end": end,
                        "text": t[start:end] if field != "vendor_name" else value,
                    }
                )

        return pa.table(
            {
                "conv_id": batch.column("conv_id"),
                "turn_idx": batch.column("turn_idx"),
                "kind": pa.array(kind, type=pa.string()),
                "extracted_text": extracted,
                "clean_text": clean,
                "confidence": conf,
                "spans": pa.array(spans, type=pa.list_(SPAN_TYPE)),
                "candidates": pa.array(cands, type=pa.list_(CANDIDATE_TYPE)),
                "parse_error": parse_error,
            }
        )


class ContentParserSink(ContentParser):
    """ContentParser with the turns sink FUSED into the actor: each full
    output batch is written to parquet as a side effect and only the four
    narrow fold columns are returned downstream.

    Why: the wide columns (extracted_text, clean_text, spans) are ~90% of
    the parse output's bytes and are needed only by the turns sink, never by
    the fold. Writing them at the source means they never enter the object
    store, the pipeline needs no materialize() barrier (read -> parse+write
    -> fold streams end-to-end with backpressure), and the shuffle carries
    only the narrow columns. On a cluster each actor writes to its own
    node-local disk/S3 lane — the sink scales with the parse pool instead of
    being a serial stage.

    At-least-once safety: the file name is a content digest of the batch's
    (conv_id, turn_idx) columns, so a retried task rewrites the same files
    byte-for-byte instead of duplicating rows (same idempotency contract as
    ray.data's write_parquet task-indexed file names).
    """

    FOLD_COLUMNS = ["conv_id", "turn_idx", "confidence", "candidates"]

    def __init__(self, cfg: ExtractConfig | None = None, sink_dir: str | None = None):
        super().__init__(cfg)
        if not sink_dir:
            raise ValueError("ContentParserSink requires sink_dir")
        import os

        self.sink_dir = sink_dir
        os.makedirs(sink_dir, exist_ok=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        full = super().__call__(batch)
        if len(full):
            import hashlib
            import os

            import pyarrow.parquet as pq

            h = hashlib.sha1()
            h.update("\x1f".join(full.column("conv_id").to_pylist()).encode())
            h.update(full.column("turn_idx").to_numpy(zero_copy_only=False).tobytes())
            final = os.path.join(
                self.sink_dir, f"turns-{h.hexdigest()[:20]}.parquet"
            )
            # Write to a per-writer temp name, then atomically rename onto the
            # digest name: a task killed mid-write can't leave a truncated
            # file under the final name, and two concurrently executing
            # duplicates of the same task (lineage re-execution racing the
            # original) each complete a whole file before the rename — the
            # loser just replaces identical bytes.
            tmp = f"{final}.tmp-{os.getpid()}-{id(batch):x}"
            pq.write_table(full, tmp)
            os.replace(tmp, final)
        return full.select(self.FOLD_COLUMNS)

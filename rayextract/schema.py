"""Canonical Arrow schemas (SURVEY.md §1.4).

Input is exactly the BASELINE.json ``input_hint`` transcript shape; outputs
replace the reference's JSON-string payload columns
(/root/reference/TextExtraction/Model/ImageOcr.cs:8-17, Worker.cs:271-272)
with native Arrow nested types.
"""

from __future__ import annotations

import pyarrow as pa

# ---- input ---------------------------------------------------------------
TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

# ---- per-turn output (reference OCRText page-tree analog) ----------------
SPAN_TYPE = pa.struct(
    [
        ("label", pa.string()),   # PERSON | ORG | DATE
        ("start", pa.int32()),    # char offsets into clean_text
        ("end", pa.int32()),
        ("text", pa.string()),
    ]
)

# Output-format version stamped into every manifest row by run_sharded.
# Bump whenever TURNS_OUT_SCHEMA / CONV_FIELDS_SCHEMA changes shape: resume
# then recomputes shards written under the old format instead of leaving a
# mixed-schema turns dataset across shard dirs (version 2 = clean_upper
# dropped from the turns output in round 2).
OUTPUT_FORMAT_VERSION = 2

TURNS_OUT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("kind", pa.string()),            # plain | html | pdfish
        ("extracted_text", pa.string()),  # main content after boilerplate strip
        # clean_upper (F2) is NOT persisted: it is byte-derivable as
        # upper_invariant(clean_text) and carrying a third near-copy of the
        # text through the object store + sink cost ~20% of headline wall
        # at 32 cpus (bandwidth-bound); the parse stage still computes it
        # in-flight for gating/extraction
        ("clean_text", pa.string()),      # F1-normalized extracted_text
        ("confidence", pa.float64()),     # per-turn extraction confidence (A1 input)
        ("spans", pa.list_(SPAN_TYPE)),
        ("parse_error", pa.string()),     # poison-row quarantine (Worker.cs:117-125)
    ]
)

# ---- per-conversation output (reference Output/TextExtractionFields analog,
#      ImageOcr.cs:19-88: one nullable {text, locator} per field) ----------
FIELD_NAMES = (
    "patient_name",
    "patient_birthdate",
    "invoice_number",
    "invoice_date",
    "order_number",
    "vendor_name",
    "gross_total",
)

CONV_FIELDS_SCHEMA = pa.schema(
    [("conv_id", pa.string())]
    + [(f, pa.string()) for f in FIELD_NAMES]
    + [(f + "_turn", pa.int32()) for f in FIELD_NAMES]
    + [
        ("mean_confidence", pa.float64()),
        ("confidence_fmt", pa.string()),  # F11 "{0:0.00}" analog (Worker.cs:268)
        ("n_turns", pa.int64()),
    ]
)

# candidate rows emitted by the extractor stage, folded by E9
CANDIDATE_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("field", pa.string()),
        ("value", pa.string()),
        ("start", pa.int32()),
        ("end", pa.int32()),
    ]
)


def empty_table(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()

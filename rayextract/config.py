"""Pipeline configuration (reference S2 analog).

The reference reads toggles + keyword lists ad hoc from appsettings.json
(/root/reference/TextExtraction/appsettings.json:13-44, Worker.cs:38-41,65,99-100).
Here the same knobs are a frozen dataclass passed to the pipeline builder.
"""

from __future__ import annotations

from dataclasses import dataclass, field


# Keyword lists mirroring the reference's SearchKeys
# (/root/reference/TextExtraction/appsettings.json:21-43). The gate compares
# upper-cased keys against the normalized upper-cased turn text (Worker.cs:216-220).
PATIENT_KEYS = (
    "NAME OF THE PATIENT",
    "NAME",
    "PATIENT NAME",
    "INSURED NAME",
    "MEMBER NAME",
    "DOB",
    "BIRTH DATE",
    "DATE OF BIRTH",
)

INVOICE_KEYS = (
    "LOAD",
    "INVOICE",
    "INVOICE NUMBER",
    "DATE",
    "PURCHASE ORDER",
    "AMOUNT",
    "REFERENCE",
    "RATE",
    "TOTAL",
    "BALANCE DUE",
)

# E7 analog: the reference hard-codes three (filename, expected line, vendor)
# triples in Worker.cs:299-364. Generalized to a broadcast small-side lookup
# table keyed by (conv_key, exact normalized line).
DEFAULT_VENDOR_LOOKUP: dict[tuple[str, str], str] = {}


@dataclass(frozen=True)
class ExtractConfig:
    """Everything the transcript-extraction pipeline needs to run.

    Mirrors the reference's config surface: ExtractPatientDetails /
    ExtractInvoiceDetails / EnableEncryption / Testing toggles
    (appsettings.json:16-20) and the SearchKeys lists.
    """

    extract_patient: bool = True
    extract_invoice: bool = True
    encrypt_pii: bool = False          # F10, off by default like appsettings.json:19
    patient_keys: tuple[str, ...] = PATIENT_KEYS
    invoice_keys: tuple[str, ...] = INVOICE_KEYS
    # broadcast vendor lookup (E7): {(conv_id, normalized_upper_line): vendor}
    vendor_lookup: dict | None = None

    # physical knobs (single-node defaults; scale by cluster size)
    batch_size: int = 4096             # rows per batch at the stateful stages
    tagger_concurrency: int = 4        # actor-pool size for the parse/tag stage
    fold_num_partitions: int | None = None  # shuffle parallelism for the conv fold
    salt_buckets: int = 0              # >0 → salted two-stage fold for skewed convs
    # hash buckets for the fold's group-reduce. Sizing rule (SCALE.md): one
    # bucket's partial rows (~n_convs/fold_buckets wide rows) must fit a
    # task's heap; target ~total_cores*4 buckets on a cluster. None → 128.
    fold_buckets: int | None = None

    def patient_keys_upper(self) -> tuple[str, ...]:
        return tuple(k.upper() for k in self.patient_keys)

    def invoice_keys_upper(self) -> tuple[str, ...]:
        return tuple(k.upper() for k in self.invoice_keys)

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
    # parse-stage hosting: "actor" = dedicated actor pool (floor keeps the
    # stage hot, pool size reserves cores for it), "task" = task-pool map
    # with per-worker-process cached parser instances, "auto" = task on wide
    # workers (>=16 cpus), actor on narrow ones. Interleaved A/Bs: at 8 cpus
    # the actor pool wins (7M-turn corpus: 47-56s vs 66-75s — the fused
    # read+parse tasks contend with the fold exchange when cores are scarce);
    # at 32 cpus the task pool ties on the 7M corpus (18.6/20.2 vs 18.7/22.6)
    # and wins on the 1.2M-turn bench corpus (no actor ramp on short jobs).
    # RAYEXTRACT_PARSE_POOL overrides for A/B.
    parse_pool: str = "auto"

    def patient_keys_upper(self) -> tuple[str, ...]:
        return tuple(k.upper() for k in self.patient_keys)

    def invoice_keys_upper(self) -> tuple[str, ...]:
        return tuple(k.upper() for k in self.invoice_keys)


def parse_pool_size(cpus: int) -> int:
    """Parse/tag actor-pool size for a node/cluster with ``cpus`` cores.

    Measured at sf0.1 (1.18M turns): the parse actors are NOT the wall —
    read tasks, the fused sink and the fold exchange need ~3/8 of the cores
    or they starve behind the actor pool (32 cpus: pool=20 ran 5.9-6.3s vs
    7.2-7.5s for pool=30/cpus-2). Below ~16 cores the pool itself is the
    bottleneck and the classic cpus-2 wins (8 cpus: pool=6 at 16.9s vs
    pool=5 at 17.6s, pool=4 at 22.8s).
    """
    if cpus <= 16:
        return max(2, cpus - 2)
    return max(12, (cpus * 5) // 8)

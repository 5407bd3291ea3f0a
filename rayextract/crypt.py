"""F10 — AES-256-CBC PII column encryption (reference CryptLib analog).

The reference encrypts extracted PII with Rijndael CBC/PKCS7, key = SHA-256 of
a passphrase truncated/zero-padded to 32 bytes, and a FIXED IV (the randomly
generated IV is discarded — /root/reference/TextExtraction/CryptLib.cs:82-125,
137-162,176-209), making ciphertexts deterministic. Reproduced with the
``cryptography`` package; off by default like appsettings.json:19.

Fixed-IV CBC is NOT semantically secure — kept only for reference parity and
deterministic tests; rotate to random-IV in any real deployment.
"""

from __future__ import annotations

import base64
import hashlib

import pandas as pd

try:
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

    HAVE_CRYPTO = True
except ImportError:  # pragma: no cover - baked into this environment
    HAVE_CRYPTO = False

_PASSPHRASE = "CHILDPASS"  # CryptLib.cs key source
_FIXED_IV = b"rayextract-iv-16"  # 16 bytes, fixed like the reference's m_DesIV


def _key() -> bytes:
    # CryptLib.cs:176-209: sha256 hex of passphrase, first 31 chars, padded to 32
    hex31 = hashlib.sha256(_PASSPHRASE.encode()).hexdigest()[:31]
    return hex31.encode().ljust(32, b"\0")


def _pkcs7_pad(b: bytes) -> bytes:
    n = 16 - len(b) % 16
    return b + bytes([n]) * n


def encrypt(text: str) -> str:
    if not HAVE_CRYPTO:
        raise NotImplementedError("cryptography package unavailable")
    enc = Cipher(algorithms.AES(_key()), modes.CBC(_FIXED_IV)).encryptor()
    ct = enc.update(_pkcs7_pad(text.encode("utf-8"))) + enc.finalize()
    return base64.b64encode(ct).decode("ascii")


def decrypt(b64: str) -> str:
    if not HAVE_CRYPTO:
        raise NotImplementedError("cryptography package unavailable")
    dec = Cipher(algorithms.AES(_key()), modes.CBC(_FIXED_IV)).decryptor()
    pt = dec.update(base64.b64decode(b64)) + dec.finalize()
    return pt[: -pt[-1]].decode("utf-8")


def encrypt_columns_batch(df: pd.DataFrame, cols: list[str]) -> pd.DataFrame:
    """map_batches body: encrypt the named string columns in place
    (Worker.cs:238-250 encrypts the extracted patient fields)."""
    df = df.copy()
    for c in cols:
        df[c] = df[c].map(lambda v: encrypt(v) if isinstance(v, str) and v else v)
    return df

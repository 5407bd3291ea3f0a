"""F10 AES-256-CBC PII encryption: round trip, determinism, key shape."""

import base64

import pandas as pd
import pytest

from rayextract.crypt import HAVE_CRYPTO, _key, decrypt, encrypt, encrypt_columns_batch

pytestmark = pytest.mark.skipif(not HAVE_CRYPTO, reason="cryptography not installed")


def test_round_trip():
    for s in ("JANE DOE", "", "unicode ß 🙂", "x" * 1000):
        assert decrypt(encrypt(s)) == s


def test_deterministic_fixed_iv():
    # the reference discards its random IV and uses a fixed one
    # (CryptLib.cs:137-162) -> equal plaintexts give equal ciphertexts
    assert encrypt("JANE DOE") == encrypt("JANE DOE")


def test_key_derivation_shape():
    # CryptLib.cs:176-209: sha256 hex truncated to 31 chars, zero-padded to 32
    k = _key()
    assert len(k) == 32
    assert k[-1] == 0  # padded final byte
    assert k[:31].decode("ascii").isalnum()


def test_ciphertext_is_base64_blocks():
    ct = base64.b64decode(encrypt("abc"))
    assert len(ct) % 16 == 0  # CBC block multiple


def test_encrypt_columns_batch_skips_empty():
    df = pd.DataFrame({"a": ["secret", "", None], "b": [1, 2, 3]})
    out = encrypt_columns_batch(df, ["a"])
    assert out["a"][0] != "secret" and decrypt(out["a"][0]) == "secret"
    assert out["a"][1] == "" and out["a"][2] is None
    assert out["b"].tolist() == [1, 2, 3]

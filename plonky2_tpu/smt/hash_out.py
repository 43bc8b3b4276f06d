"""HashOut values for the SMT: 4 Goldilocks elements, hex serde, packing.

Parity: /root/reference/src/smt/goldilocks_poseidon/hash/mod.rs:16-323
(`WrappedHashOut` with 0x-hex serde, u32/u64/u128 packing) and
`KeyLike::to_bits` (goldilocks_poseidon/mod.rs:27-48): little-endian bit
decomposition of the 32-byte LE encoding.
"""

from __future__ import annotations

from ..field import gl

HashOut = tuple          # (e0, e1, e2, e3) Python ints < p
ZERO_HASH: HashOut = (0, 0, 0, 0)


def hash_from_u32(x: int) -> HashOut:
    assert 0 <= x < (1 << 32)
    return (x, 0, 0, 0)


def hash_from_u64(x: int) -> HashOut:
    # split to avoid non-canonical elements (reference packs into u32 pairs)
    return (x & 0xFFFFFFFF, x >> 32, 0, 0)


def hash_from_u128(x: int) -> HashOut:
    return (x & 0xFFFFFFFF, (x >> 32) & 0xFFFFFFFF,
            (x >> 64) & 0xFFFFFFFF, (x >> 96) & 0xFFFFFFFF)


def to_bytes_le(h: HashOut) -> bytes:
    return b"".join(int(e).to_bytes(8, "little") for e in h)


def from_bytes_le(b: bytes) -> HashOut:
    assert len(b) == 32
    out = tuple(int.from_bytes(b[8 * i:8 * i + 8], "little") for i in range(4))
    assert all(e < gl.P for e in out)
    return out


def to_hex(h: HashOut) -> str:
    """0x-prefixed big-endian hex (reference's serde form)."""
    return "0x" + to_bytes_le(h)[::-1].hex()


def from_hex(s: str) -> HashOut:
    assert s.startswith("0x")
    raw = bytes.fromhex(s[2:].zfill(64))[::-1]
    return from_bytes_le(raw)


def key_to_bits(key: HashOut, n_bits: int = 256) -> list[bool]:
    """LE bits of the 32-byte encoding: bit i = bit (i%64) of element i//64."""
    return [bool((key[i // 64] >> (i % 64)) & 1) for i in range(n_bits)]

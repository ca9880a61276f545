"""Pure-Python Solidity ABI decoder (and minimal encoder for tests).

The reference delegates this computation to its external Spark app; the
contract it must satisfy is defined by the ABI JSON handed over per task
(reference: dags/chains/parser.py:71-98) and the ABI data model
(reference: dags/chains/contracts.py:20-49). We implement the public
Solidity ABI v2 specification (head/tail encoding, dynamic offsets,
nested tuple / tuple[]).

This module is CPU-side worker code invoked from Arrow-batched pandas
UDFs in ``operators.decode`` — one Python call per row *batch*, plain
bytes in/out, no Spark imports here.

Value mapping (must line up with schemas.abi.solidity_to_spark_type):
- u/int*   → int (caller converts to Decimal(38,0); > 38 digits → None)
- address  → '0x' + 20-byte lowercase hex
- bool     → bool
- bytes/bytesN → '0x' + hex
- string   → utf-8 (errors replaced)
- tuple    → dict keyed by component name
- T[] / T[k] → list
"""

from __future__ import annotations

from typing import Any

from ..schemas.abi import AbiInput, _ARRAY_RE

WORD = 32
_UINT_MAX_DECIMAL38 = 10**38  # Decimal(38,0) overflow clamp policy


class AbiDecodeError(ValueError):
    pass


def _is_dynamic(inp: AbiInput) -> bool:
    m = _ARRAY_RE.match(inp.type)
    if m:
        if m.group("len") == "":
            return True
        base = AbiInput(name=inp.name, type=m.group("base"),
                        components=inp.components)
        return _is_dynamic(base)
    if inp.type in ("bytes", "string"):
        return True
    if inp.type == "tuple":
        return any(_is_dynamic(c) for c in inp.components)
    return False


def _head_size(inp: AbiInput) -> int:
    if _is_dynamic(inp):
        return WORD
    m = _ARRAY_RE.match(inp.type)
    if m:  # static fixed-length array
        base = AbiInput(name=inp.name, type=m.group("base"),
                        components=inp.components)
        return int(m.group("len")) * _head_size(base)
    if inp.type == "tuple":
        return sum(_head_size(c) for c in inp.components)
    return WORD


def _word(data: bytes, pos: int) -> bytes:
    w = data[pos:pos + WORD]
    if len(w) < WORD:
        raise AbiDecodeError(f"truncated word at {pos}")
    return w


def decode_word(inp: AbiInput, w: bytes) -> Any:
    """Decode one 32-byte word of a static elementary type."""
    t = inp.type
    if t.startswith("uint") or t == "uint":
        return int.from_bytes(w, "big")
    if t.startswith("int") or t == "int":
        return int.from_bytes(w, "big", signed=True)
    if t == "address":
        return "0x" + w[12:].hex()
    if t == "bool":
        return int.from_bytes(w, "big") != 0
    if t.startswith("bytes"):  # bytesN
        n = int(t[5:])
        return "0x" + w[:n].hex()
    raise AbiDecodeError(f"not a word-decodable type: {t}")


def _decode_at(inp: AbiInput, data: bytes, pos: int) -> Any:
    """Decode a *static* type laid out in place at ``pos``."""
    m = _ARRAY_RE.match(inp.type)
    if m:
        base = AbiInput(name=inp.name, type=m.group("base"),
                        components=inp.components)
        n = int(m.group("len"))
        step = _head_size(base)
        return [_decode_at(base, data, pos + i * step) for i in range(n)]
    if inp.type == "tuple":
        out: dict[str, Any] = {}
        off = pos
        for i, c in enumerate(inp.components):
            out[c.name or f"_{i}"] = _decode_at(c, data, off)
            off += _head_size(c)
        return out
    return decode_word(inp, _word(data, pos))


def _decode_dynamic(inp: AbiInput, data: bytes, base: int) -> Any:
    """Decode a dynamic type whose tail starts at ``base``."""
    t = inp.type
    m = _ARRAY_RE.match(t)
    if m:
        elem = AbiInput(name=inp.name, type=m.group("base"),
                        components=inp.components)
        if m.group("len") == "":
            n = int.from_bytes(_word(data, base), "big")
            if n > (len(data) - base) // WORD + 1:
                raise AbiDecodeError(f"implausible array length {n}")
            return _decode_sequence([elem] * n, data, base + WORD)
        # fixed-length array of dynamic elements
        n = int(m.group("len"))
        return _decode_sequence([elem] * n, data, base)
    if t == "bytes" or t == "string":
        n = int.from_bytes(_word(data, base), "big")
        payload = data[base + WORD: base + WORD + n]
        if len(payload) < n:
            raise AbiDecodeError("truncated bytes/string payload")
        return (
            payload.decode("utf-8", errors="replace") if t == "string"
            else "0x" + payload.hex()
        )
    if t == "tuple":
        vals = _decode_sequence(list(inp.components), data, base)
        return {
            (c.name or f"_{i}"): v
            for i, (c, v) in enumerate(zip(inp.components, vals))
        }
    raise AbiDecodeError(f"not a dynamic type: {t}")


def _decode_sequence(inputs: list[AbiInput], data: bytes, base: int) -> list[Any]:
    """Decode a head/tail sequence starting at ``base``."""
    out: list[Any] = []
    head = base
    for inp in inputs:
        if _is_dynamic(inp):
            tail = int.from_bytes(_word(data, head), "big")
            out.append(_decode_dynamic(inp, data, base + tail))
            head += WORD
        else:
            out.append(_decode_at(inp, data, head))
            head += _head_size(inp)
    return out


def decode_abi(inputs: list[AbiInput], data: bytes) -> list[Any]:
    """Decode an argument block (event data / call input minus selector /
    call output) against ``inputs``. Raises AbiDecodeError on malformed
    payloads — callers map that to null columns."""
    return _decode_sequence(list(inputs), data or b"", 0)


# ---------------------------------------------------------------------------
# Minimal encoder — test-only (property tests round-trip random values).
# ---------------------------------------------------------------------------

def _enc_word_int(v: int, signed: bool = False) -> bytes:
    return int(v).to_bytes(WORD, "big", signed=signed)


def encode_abi(inputs: list[AbiInput], values: list[Any]) -> bytes:
    heads: list[bytes] = []
    tails: list[bytes] = []
    head_total = sum(_head_size(i) for i in inputs)
    for inp, v in zip(inputs, values):
        if _is_dynamic(inp):
            offset = head_total + sum(len(t) for t in tails)
            heads.append(_enc_word_int(offset))
            tails.append(_encode_tail(inp, v))
        else:
            heads.append(_encode_static(inp, v))
    return b"".join(heads) + b"".join(tails)


def _encode_static(inp: AbiInput, v: Any) -> bytes:
    m = _ARRAY_RE.match(inp.type)
    if m:
        base = AbiInput(name=inp.name, type=m.group("base"),
                        components=inp.components)
        return b"".join(_encode_static(base, x) for x in v)
    t = inp.type
    if t == "tuple":
        return b"".join(
            _encode_static(c, v[c.name or f"_{i}"])
            for i, c in enumerate(inp.components)
        )
    if t.startswith("uint") or t == "uint":
        return _enc_word_int(v)
    if t.startswith("int") or t == "int":
        return _enc_word_int(v, signed=True)
    if t == "address":
        return bytes(12) + bytes.fromhex(v[2:])
    if t == "bool":
        return _enc_word_int(1 if v else 0)
    if t.startswith("bytes"):
        raw = bytes.fromhex(v[2:])
        return raw + bytes(WORD - len(raw))
    raise AbiDecodeError(f"cannot encode static {t}")


def _encode_tail(inp: AbiInput, v: Any) -> bytes:
    t = inp.type
    m = _ARRAY_RE.match(t)
    if m:
        elem = AbiInput(name=inp.name, type=m.group("base"),
                        components=inp.components)
        body = encode_abi([elem] * len(v), list(v))
        if m.group("len") == "":
            return _enc_word_int(len(v)) + body
        return body
    if t in ("bytes", "string"):
        raw = v.encode() if t == "string" else bytes.fromhex(v[2:])
        pad = (-len(raw)) % WORD
        return _enc_word_int(len(raw)) + raw + bytes(pad)
    if t == "tuple":
        vals = [v[c.name or f"_{i}"] for i, c in enumerate(inp.components)]
        return encode_abi(list(inp.components), vals)
    raise AbiDecodeError(f"cannot encode dynamic {t}")

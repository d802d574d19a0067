"""Canned Yellowstone wire-frame fixture — the streaming twin of
rpc_fixture.py: golden-shaped SubscribeUpdate transaction frames
(−0.5 SOL transfers, the reference parser's own vector,
adapters/src/solana_parser.rs test) encoded against the PUBLIC
protobuf field numbers, for driving the grpc_replay streaming source
and the wire decoder end to end without a network.

Kept independent of streaming/yellowstone.py on purpose: this encoder
writes protobuf bytes by hand (varints/tags) exactly like the test
suite's independent encoder, so agreement between decode(encode(x))
and the golden oracle certifies the decoder against the wire format,
not against a shared codec.
"""

from __future__ import annotations

import base64
import json

# --- minimal protobuf writers (wire types 0=varint, 1=64-bit, 2=len) ----


def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _tag(fnum: int, wt: int) -> bytes:
    return _varint((fnum << 3) | wt)


def _uint_field(fnum: int, v: int) -> bytes:
    return _tag(fnum, 0) + _varint(v)


def _len_field(fnum: int, body: bytes) -> bytes:
    return _tag(fnum, 2) + _varint(len(body)) + body


def _packed_uint64(fnum: int, vals: list[int]) -> bytes:
    return _len_field(fnum, b"".join(_varint(v) for v in vals))


# Golden constants (b58: wallet 4uQeVj5tqViQh7yWWGStvkEG1Zmhx6uasJtWCJziofM)
WALLET_RAW = bytes([1]) + bytes(31)
OTHER_RAW = bytes([2]) + bytes(31)
SIG_RAW = bytes([9]) * 64

GOLDEN_WALLET_B58 = "4uQeVj5tqViQh7yWWGStvkEG1Zmhx6uasJtWCJziofM"
GOLDEN_SIG_B58 = (
    "BUguQsv2ZuHus54HAFzjdJHzZBkygAjKhEeYwSG19tUfUyvvz3worsdQCdAX"
    "DNjakJHioSiyxhFiDJrm8XpSXRA"
)
GOLDEN_BLOCK_TIME = 1_672_531_200


def golden_tx_frame(slot: int, block_time: int, index: int = 7) -> bytes:
    """One SubscribeUpdate transaction frame (public Yellowstone field
    numbers: update.transaction = 4, update.created_at/ts = 11): fee
    payer WALLET_RAW, pre 10 SOL → post 9.5 SOL (the −0.5 SOL golden
    delta), fee 5000, non-vote."""
    header = _uint_field(1, 1) + _uint_field(2, 0) + _uint_field(3, 1)
    message = _len_field(1, header) + _len_field(2, WALLET_RAW) + _len_field(2, OTHER_RAW)
    tx = _len_field(1, SIG_RAW) + _len_field(2, message)
    meta = (
        _uint_field(2, 5000)
        + _packed_uint64(3, [10_000_000_000, 0])
        + _packed_uint64(4, [9_500_000_000, 500_000_000])
    )
    info = (
        _len_field(1, SIG_RAW)
        + _len_field(3, tx)
        + _len_field(4, meta)
        + _uint_field(5, index)
    )
    tx_update = _len_field(1, info) + _uint_field(2, slot)
    ts = _uint_field(1, block_time)
    return _len_field(4, tx_update) + _len_field(11, ts)


def write_wire_log(path: str, n: int = 7, start_seq: int = 0) -> None:
    """Append ``n`` golden frames as the relay's JSONL log format
    ({"seq": N, "frame_b64": ...}); block_time increments per frame so
    downstream rows are distinguishable."""
    with open(path, "a", encoding="utf-8") as fh:
        for i in range(n):
            frame = golden_tx_frame(slot=1000 + start_seq + i, block_time=GOLDEN_BLOCK_TIME + start_seq + i)
            fh.write(
                json.dumps(
                    {
                        "seq": start_seq + i,
                        "frame_b64": base64.b64encode(frame).decode(),
                    }
                )
                + "\n"
            )

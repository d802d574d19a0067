"""Yellowstone gRPC message decode — the wire half of the reference's
described-but-stubbed live subscription source.

The reference declares a Yellowstone/Geyser gRPC adapter and stubs its
connect path (README.md:3, adapters/src/solana_grpc.rs:17-24 — the
fetch returns empty "to allow compilation"). The engine's Structured
Streaming stand-ins (streaming/pipeline.py) replay the same bronze JSON
through file and Kafka sources; what was missing is fidelity to the
ACTUAL message shape a Yellowstone subscription delivers. This module
closes that gap: a decoder for the public ``SubscribeUpdate`` protobuf
layout (the open-source yellowstone-grpc ``geyser.proto`` plus Solana's
``confirmed_block`` storage proto), implemented against the protobuf
WIRE FORMAT directly — no protobuf runtime or generated classes exist
in this container, and the wire format itself (varints + tagged
length-delimited fields) is a published, stable public spec.

Field numbers used (public proto definitions):
  SubscribeUpdate:            transaction = 4, created_at = 11
  SubscribeUpdateTransaction: info = 1, slot = 2
  SubscribeUpdateTransactionInfo:
      signature = 1, is_vote = 2, transaction = 3, meta = 4, index = 5
  Transaction (solana.storage.ConfirmedBlock):
      signatures = 1, message = 2
  Message:   header = 1, account_keys = 2, instructions = 4
  MessageHeader: num_required_signatures = 1,
      num_readonly_signed_accounts = 2, num_readonly_unsigned_accounts = 3
  TransactionStatusMeta: err = 1, fee = 2, pre_balances = 3,
      post_balances = 4, log_messages = 6,
      pre_token_balances = 7, post_token_balances = 8
  TokenBalance: account_index = 1, mint = 2, ui_token_amount = 3,
      owner = 4
  UiTokenAmount: ui_amount = 1, decimals = 2, amount = 3
  google.protobuf.Timestamp: seconds = 1, nanos = 2

The decoder emits bronze rows whose ``raw_metadata`` matches the
getTransaction-style JSON the U1 normalize operator already parses
(schemas.SOLANA_TX_SCHEMA) — so a live Yellowstone feed, the Kafka
replay, and the file landing dir all converge on one normalize path.

Scale shape: decode runs inside ``mapInPandas`` (Arrow batches, one
Python crossing per batch, no per-row UDF), keyed work only — the
stream partitioning (Kafka partitions) is preserved, and the output is
the bronze interchange every downstream idempotent sink already
handles.
"""

from __future__ import annotations

import json
import struct
from collections.abc import Iterator

import pandas as pd
from pandas.errors import OutOfBoundsDatetime
from pyspark.sql import DataFrame

from spectraplex_spark.schemas import BRONZE_SCHEMA

# --------------------------------------------------------------------------
# protobuf wire-format primitives (public spec: varint + tagged fields)
# --------------------------------------------------------------------------


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = 0
    val = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not (b & 0x80):
            return val, i
        shift += 7
        if shift > 70:
            raise ValueError("varint overflow")


def _fields(buf: bytes) -> Iterator[tuple[int, int, int | bytes]]:
    """Yield (field_number, wire_type, value) over one message's bytes."""
    i, n = 0, len(buf)
    while i < n:
        key, i = _read_varint(buf, i)
        fnum, wt = key >> 3, key & 7
        if wt == 0:  # varint
            val, i = _read_varint(buf, i)
        elif wt == 2:  # length-delimited
            ln, i = _read_varint(buf, i)
            if i + ln > n:
                raise ValueError("truncated length-delimited field")
            val = buf[i : i + ln]
            i += ln
        elif wt == 1:  # fixed64
            if i + 8 > n:
                raise ValueError("truncated fixed64 field")
            val = buf[i : i + 8]
            i += 8
        elif wt == 5:  # fixed32
            if i + 4 > n:
                raise ValueError("truncated fixed32 field")
            val = buf[i : i + 4]
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield fnum, wt, val


def _packed_uint64s(val: int | bytes, wt: int) -> list[int]:
    """repeated uint64: proto3 packs by default (wt 2), but unpacked
    varints (wt 0) are legal on the wire — accept both."""
    if wt == 0:
        return [int(val)]
    out, i = [], 0
    while i < len(val):
        v, i = _read_varint(val, i)
        out.append(v)
    return out


_B58 = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"


def b58encode(b: bytes) -> str:
    """Base58 (Bitcoin/Solana alphabet) — pubkeys and signatures travel
    as raw 32/64-byte values on the Yellowstone wire but as base58
    strings in the getTransaction JSON the parser consumes."""
    n = int.from_bytes(b, "big")
    out = []
    while n:
        n, r = divmod(n, 58)
        out.append(_B58[r])
    pad = len(b) - len(b.lstrip(b"\x00"))
    return "1" * pad + "".join(reversed(out))


# --------------------------------------------------------------------------
# message decoders
# --------------------------------------------------------------------------


def _decode_header(buf: bytes) -> tuple[int, int, int]:
    req = ro_signed = ro_unsigned = 0
    for fnum, _wt, val in _fields(buf):
        if fnum == 1:
            req = int(val)
        elif fnum == 2:
            ro_signed = int(val)
        elif fnum == 3:
            ro_unsigned = int(val)
    return req, ro_signed, ro_unsigned


def _decode_ui_token_amount(buf: bytes) -> dict:
    out = {"uiAmount": None, "decimals": 0, "amount": None}
    for fnum, wt, val in _fields(buf):
        if fnum == 1 and wt == 1:
            out["uiAmount"] = struct.unpack("<d", val)[0]
        elif fnum == 2:
            out["decimals"] = int(val)
        elif fnum == 3:
            out["amount"] = val.decode("utf-8")
    return out


def _decode_token_balance(buf: bytes) -> dict:
    out = {"accountIndex": 0, "mint": None, "owner": None, "uiTokenAmount": None}
    for fnum, wt, val in _fields(buf):
        if fnum == 1:
            out["accountIndex"] = int(val)
        elif fnum == 2:
            out["mint"] = val.decode("utf-8")
        elif fnum == 3:
            out["uiTokenAmount"] = _decode_ui_token_amount(val)
        elif fnum == 4:
            out["owner"] = val.decode("utf-8")
    return out


def _decode_meta(buf: bytes) -> dict:
    meta = {
        "err": None,
        "fee": 0,
        "preBalances": [],
        "postBalances": [],
        "preTokenBalances": [],
        "postTokenBalances": [],
        "logMessages": [],
        "rewards": [],
    }
    for fnum, wt, val in _fields(buf):
        if fnum == 1:
            meta["err"] = {}  # TransactionError present → failed tx
        elif fnum == 2:
            meta["fee"] = int(val)
        elif fnum == 3:
            meta["preBalances"].extend(_packed_uint64s(val, wt))
        elif fnum == 4:
            meta["postBalances"].extend(_packed_uint64s(val, wt))
        elif fnum == 6:
            meta["logMessages"].append(val.decode("utf-8"))
        elif fnum == 7:
            meta["preTokenBalances"].append(_decode_token_balance(val))
        elif fnum == 8:
            meta["postTokenBalances"].append(_decode_token_balance(val))
    return meta


def _decode_message(buf: bytes) -> dict:
    header = (0, 0, 0)
    keys: list[bytes] = []
    for fnum, _wt, val in _fields(buf):
        if fnum == 1:
            header = _decode_header(val)
        elif fnum == 2:
            keys.append(bytes(val))
    req, ro_signed, ro_unsigned = header
    total = len(keys)
    account_keys = []
    for idx, k in enumerate(keys):
        signer = idx < req
        # Solana account-ordering rule: writable signers, readonly
        # signers, writable non-signers, readonly non-signers.
        writable = (idx < req - ro_signed) or (req <= idx < total - ro_unsigned)
        account_keys.append(
            {"pubkey": b58encode(k), "signer": signer, "writable": writable}
        )
    return {
        "accountKeys": account_keys,
        "instructions": [],
        "recentBlockhash": "",
    }


def decode_subscribe_update(raw: bytes) -> dict | None:
    """One Yellowstone ``SubscribeUpdate`` frame → getTransaction-style
    dict, or None for non-transaction updates (slot/ping/account/block
    frames have different oneof fields and are filtered here, mirroring
    the subscription filter the reference's adapter would request)."""
    tx_update = None
    created_at = None
    for fnum, wt, val in _fields(raw):
        if fnum == 4 and wt == 2:
            tx_update = val
        elif fnum == 11 and wt == 2:
            secs = 0
            for f2, _w2, v2 in _fields(val):
                if f2 == 1:
                    secs = int(v2)
            created_at = secs
    if tx_update is None:
        return None
    slot, info = 0, None
    for fnum, _wt, val in _fields(tx_update):
        if fnum == 1:
            info = val
        elif fnum == 2:
            slot = int(val)
    if info is None:
        return None
    signature = b""
    is_vote = False
    tx_buf = meta_buf = None
    index = 0
    for fnum, _wt, val in _fields(info):
        if fnum == 1:
            signature = bytes(val)
        elif fnum == 2:
            is_vote = bool(val)
        elif fnum == 3:
            tx_buf = val
        elif fnum == 4:
            meta_buf = val
        elif fnum == 5:
            index = int(val)
    if is_vote:  # vote spam is filtered at the subscription in practice
        return None
    signatures = []
    message = {"accountKeys": [], "instructions": [], "recentBlockhash": ""}
    if tx_buf is not None:
        for fnum, _wt, val in _fields(tx_buf):
            if fnum == 1:
                signatures.append(b58encode(bytes(val)))
            elif fnum == 2:
                message = _decode_message(val)
    if not signatures and signature:
        signatures = [b58encode(signature)]
    return {
        "slot": slot,
        "index": index,
        "blockTime": created_at,
        "transaction": {"signatures": signatures, "message": message},
        "meta": _decode_meta(meta_buf) if meta_buf is not None else None,
    }


# --------------------------------------------------------------------------
# DataFrame decode stage (batch AND streaming — mapInPandas works on both)
# --------------------------------------------------------------------------


def decode_yellowstone(frames: DataFrame, value_col: str = "value") -> DataFrame:
    """Binary Yellowstone frames → bronze rows (BRONZE_SCHEMA).

    Source-agnostic like decode_bronze_kafka: any DataFrame (static or
    streaming) with a binary ``value_col`` works — the Kafka wire frame,
    a raw-frame capture replay, or a test fixture. Malformed frames and
    non-transaction updates yield no row (the quarantine lane for
    malformed BRONZE payloads stays in normalize's parse_failures; here
    the frame itself is unreadable, so there is nothing to land).

    Bronze mapping: the fee payer (first account key) is the wallet the
    subscription tracks — the reference's fetch-history path stores one
    bronze row per (wallet, tx) the same way (adapters/src/solana_rpc.rs
    history scan).
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for raw in pdf[value_col]:
                if raw is None:
                    continue
                # The WHOLE per-frame path (decode + row build) is the
                # skip scope: a wrong-wire-type field surfaces as
                # TypeError/AttributeError (int where bytes expected and
                # vice versa), and an out-of-range created_at overflows
                # pd.Timestamp — any of these escaping would kill the
                # streaming query on one bad frame instead of dropping
                # it, which is the documented contract.
                try:
                    tx = decode_subscribe_update(bytes(raw))
                    if tx is None:
                        continue
                    sigs = tx["transaction"]["signatures"]
                    keys = tx["transaction"]["message"]["accountKeys"]
                    tx_hash = sigs[0] if sigs else ""
                    wallet = keys[0]["pubkey"] if keys else ""
                    # created_at: null rather than garbage for absurd
                    # epochs (a corrupt varint decodes to e.g. 2^61 s,
                    # which pandas happily renders as year-73-billion
                    # at second resolution and Spark then mangles);
                    # 253402300799 = 9999-12-31, the sanity ceiling
                    bt = tx.get("blockTime")
                    created = (
                        pd.Timestamp(bt, unit="s")
                        if bt is not None and 0 <= bt <= 253402300799
                        else None
                    )
                    rows.append(
                        {
                            "id": f"{tx['slot']}-{tx['index']}",
                            "user_id": "",
                            "wallet_address": wallet,
                            "timestamp": int(tx.get("blockTime") or 0),
                            "tx_hash": tx_hash,
                            "chain": "solana",
                            "raw_metadata": json.dumps(
                                {k: v for k, v in tx.items() if k != "index"}
                            ),
                            "created_at": created,
                        }
                    )
                except (
                    ValueError,  # truncated fields, varint overflow, bad ts
                    IndexError,
                    UnicodeDecodeError,
                    TypeError,  # varint where bytes expected
                    AttributeError,  # bytes op on an int field
                    OverflowError,
                    OutOfBoundsDatetime,
                ):
                    continue  # unreadable frame: nothing to land
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in BRONZE_SCHEMA.fields],
            )

    return frames.mapInPandas(decode, BRONZE_SCHEMA)

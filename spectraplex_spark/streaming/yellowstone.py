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
  SubscribeUpdate (oneof):    account = 2, slot = 3, transaction = 4,
      block = 5, ping = 6, block_meta = 7, entry = 8, pong = 9,
      transaction_status = 10; created_at = 11
  SubscribeUpdateAccount:     account = 1, slot = 2, is_startup = 3
  SubscribeUpdateAccountInfo: pubkey = 1, lamports = 2, owner = 3,
      executable = 4, rent_epoch = 5, data = 6, write_version = 7,
      txn_signature = 8
  SubscribeUpdateBlockMeta:   slot = 1, blockhash = 2, rewards = 3,
      block_time = 4, block_height = 5, parent_slot = 6,
      parent_blockhash = 7, executed_transaction_count = 8,
      entries_count = 9
  UnixTimestamp: timestamp = 1;  BlockHeight: block_height = 1
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
from pyspark.sql import DataFrame, types as T

from spectraplex_spark.schemas import BRONZE_SCHEMA

# bronze-adjacent frames for the two non-transaction event families the
# reference's README describes subscribing to (README.md:3)
ACCOUNT_UPDATE_SCHEMA = T.StructType(
    [
        T.StructField("pubkey", T.StringType()),
        T.StructField("lamports", T.LongType()),
        T.StructField("owner", T.StringType()),
        T.StructField("executable", T.BooleanType()),
        T.StructField("rent_epoch", T.LongType()),
        T.StructField("data", T.BinaryType()),
        T.StructField("write_version", T.LongType()),
        T.StructField("txn_signature", T.StringType()),
        T.StructField("slot", T.LongType()),
        T.StructField("is_startup", T.BooleanType()),
        T.StructField("created_at", T.TimestampType()),
    ]
)

BLOCK_META_SCHEMA = T.StructType(
    [
        T.StructField("slot", T.LongType()),
        T.StructField("blockhash", T.StringType()),
        T.StructField("block_time", T.TimestampType()),
        T.StructField("block_height", T.LongType()),
        T.StructField("parent_slot", T.LongType()),
        T.StructField("parent_blockhash", T.StringType()),
        T.StructField("executed_transaction_count", T.LongType()),
        T.StructField("entries_count", T.LongType()),
        T.StructField("created_at", T.TimestampType()),
    ]
)

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


_I64_MAX = (1 << 63) - 1


def _i64(val) -> int:
    """Signed-int64 guard for u64 wire varints: decoded rows cross into
    Arrow LongType columns OUTSIDE the per-frame try, so an over-range
    value must fail HERE — inside the per-row try, dropping one frame —
    instead of killing the whole streaming query at batch conversion
    (review finding r13)."""
    v = int(val)
    if v > _I64_MAX:
        raise ValueError(f"u64 value {v} exceeds signed int64")
    return v


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


# SubscribeUpdate oneof field numbers (geyser.proto)
FRAME_ACCOUNT = 2
FRAME_SLOT = 3
FRAME_TRANSACTION = 4
FRAME_BLOCK_META = 7
_CREATED_AT = 11


def _toplevel(raw: bytes) -> tuple[dict[int, bytes], int | None]:
    """One pass over a ``SubscribeUpdate`` frame: the oneof payload
    (keyed by field number) plus the decoded ``created_at`` seconds.
    Shared by all three frame-family decoders so they agree on framing."""
    payloads: dict[int, bytes] = {}
    created_at = None
    for fnum, wt, val in _fields(raw):
        if fnum == _CREATED_AT and wt == 2:
            for f2, _w2, v2 in _fields(val):
                if f2 == 1:
                    created_at = int(v2)
        elif wt == 2:
            payloads[fnum] = val
    return payloads, created_at


def frame_kind(raw: bytes) -> str | None:
    """'transaction' | 'account' | 'block_meta' | None (slot/ping/other)."""
    payloads, _ = _toplevel(raw)
    if FRAME_TRANSACTION in payloads:
        return "transaction"
    if FRAME_ACCOUNT in payloads:
        return "account"
    if FRAME_BLOCK_META in payloads:
        return "block_meta"
    return None


def decode_subscribe_update(raw: bytes) -> dict | None:
    """One Yellowstone ``SubscribeUpdate`` frame → getTransaction-style
    dict, or None for non-transaction updates (slot/ping/account/block
    frames have different oneof fields and are filtered here, mirroring
    the subscription filter the reference's adapter would request)."""
    payloads, created_at = _toplevel(raw)
    tx_update = payloads.get(FRAME_TRANSACTION)
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


def decode_account_update(raw: bytes) -> dict | None:
    """One ``SubscribeUpdate`` frame → account-update dict, or None for
    non-account frames. Covers the second of the three event families
    the reference's README describes subscribing to (README.md:3 —
    transactions, account updates, block metadata)."""
    payloads, created_at = _toplevel(raw)
    acct_update = payloads.get(FRAME_ACCOUNT)
    if acct_update is None:
        return None
    slot = 0
    is_startup = False
    info = None
    for fnum, _wt, val in _fields(acct_update):
        if fnum == 1:
            info = val
        elif fnum == 2:
            slot = _i64(val)  # lands in the LongType slot column
        elif fnum == 3:
            is_startup = bool(val)
    if info is None:
        return None
    out = {
        "pubkey": "",
        "lamports": 0,
        "owner": "",
        "executable": False,
        "rent_epoch": 0,
        "data": b"",
        "write_version": 0,
        "txn_signature": None,
        "slot": slot,
        "is_startup": is_startup,
        "created_at": created_at,
    }
    for fnum, _wt, val in _fields(info):
        if fnum == 1:
            out["pubkey"] = b58encode(bytes(val))
        elif fnum == 2:
            out["lamports"] = _i64(val)
        elif fnum == 3:
            out["owner"] = b58encode(bytes(val))
        elif fnum == 4:
            out["executable"] = bool(val)
        elif fnum == 5:
            # rent_epoch is u64 on the wire and u64::MAX is the STANDARD
            # value for rent-exempt mainnet accounts — clamp the
            # sentinel to int64 max instead of overflowing the signed
            # LongType at Arrow conversion (which happens OUTSIDE the
            # per-frame try and would kill the whole streaming query on
            # effectively every real account frame; review finding r13)
            out["rent_epoch"] = min(int(val), _I64_MAX)
        elif fnum == 6:
            out["data"] = bytes(val)
        elif fnum == 7:
            out["write_version"] = _i64(val)
        elif fnum == 8:
            out["txn_signature"] = b58encode(bytes(val))
    return out


def decode_block_meta(raw: bytes) -> dict | None:
    """One ``SubscribeUpdate`` frame → block-metadata dict, or None for
    non-block-meta frames (the third described event family). Rewards
    (field 3) are skipped — the reference's pipeline consumes no reward
    data and the frame stays bronze-faithful without them."""
    payloads, created_at = _toplevel(raw)
    bm = payloads.get(FRAME_BLOCK_META)
    if bm is None:
        return None
    out = {
        "slot": 0,
        "blockhash": "",
        "block_time": None,
        "block_height": None,
        "parent_slot": 0,
        "parent_blockhash": "",
        "executed_transaction_count": 0,
        "entries_count": 0,
        "created_at": created_at,
    }
    for fnum, _wt, val in _fields(bm):
        if fnum == 1:
            out["slot"] = _i64(val)
        elif fnum == 2:
            out["blockhash"] = val.decode("utf-8")
        elif fnum == 4:  # UnixTimestamp { timestamp = 1 }
            for f2, _w2, v2 in _fields(val):
                if f2 == 1:
                    out["block_time"] = int(v2)
        elif fnum == 5:  # BlockHeight { block_height = 1 }
            for f2, _w2, v2 in _fields(val):
                if f2 == 1:
                    out["block_height"] = _i64(v2)
        elif fnum == 6:
            out["parent_slot"] = _i64(val)
        elif fnum == 7:
            out["parent_blockhash"] = val.decode("utf-8")
        elif fnum == 8:
            out["executed_transaction_count"] = _i64(val)
        elif fnum == 9:
            out["entries_count"] = _i64(val)
    return out


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
                            # derive from the SANITIZED value: the raw
                            # blockTime of a corrupt varint (up to ~2^77)
                            # would overflow the signed LongType at Arrow
                            # conversion — OUTSIDE the per-frame try —
                            # and kill the whole query; and keeping a
                            # year-73-billion epoch one column over from
                            # the nulled created_at was inconsistent
                            # anyway (review findings r13)
                            "timestamp": int(bt) if created is not None else 0,
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


_DECODE_SKIP = (
    ValueError,
    IndexError,
    UnicodeDecodeError,
    TypeError,
    AttributeError,
    OverflowError,
    OutOfBoundsDatetime,
)

# 9999-12-31 in epoch seconds: the same sanity ceiling the transaction
# path applies — a corrupt varint otherwise decodes to absurd epochs
_TS_CEILING = 253402300799


def _epoch_ts(secs: int | None) -> pd.Timestamp | None:
    return (
        pd.Timestamp(secs, unit="s")
        if secs is not None and 0 <= secs <= _TS_CEILING
        else None
    )


def _frame_decoder(decoder, to_row, schema):
    """Shared mapInPandas body for the account/block frame families:
    per-frame fault containment identical to the transaction path —
    unreadable frames and other-family frames yield no row."""

    def build(frames: DataFrame, value_col: str = "value") -> DataFrame:
        def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for raw in pdf[value_col]:
                    if raw is None:
                        continue
                    try:
                        d = decoder(bytes(raw))
                        if d is None:
                            continue
                        rows.append(to_row(d))
                    except _DECODE_SKIP:
                        continue
                yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

        return frames.mapInPandas(decode, schema)

    return build


def _account_row(d: dict) -> dict:
    return {**d, "created_at": _epoch_ts(d["created_at"])}


def _block_meta_row(d: dict) -> dict:
    return {
        **d,
        "block_time": _epoch_ts(d["block_time"]),
        "created_at": _epoch_ts(d["created_at"]),
    }


#: Binary Yellowstone frames → account-update rows (ACCOUNT_UPDATE_SCHEMA).
#: Transaction/slot/ping frames yield no row; pair with
#: :func:`decode_yellowstone` over the same frame stream to split one
#: subscription into per-family bronze landings.
decode_yellowstone_accounts = _frame_decoder(
    decode_account_update, _account_row, ACCOUNT_UPDATE_SCHEMA
)

#: Binary Yellowstone frames → block-metadata rows (BLOCK_META_SCHEMA).
decode_yellowstone_blocks = _frame_decoder(
    decode_block_meta, _block_meta_row, BLOCK_META_SCHEMA
)

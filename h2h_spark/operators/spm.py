"""SentencePiece model-file vocabulary walk — the tokenizer-artifact
interop op (public proto: google/sentencepiece
``src/sentencepiece_model.proto``).  A ``.model`` file is a serialized
``ModelProto``; its field 1 is the repeated ``SentencePiece`` message
(``piece`` string = 1, ``score`` float = 2, ``type`` enum = 3 with
NORMAL=1 / UNKNOWN=2 / CONTROL=3 / USER_DEFINED=4 / UNUSED=5 /
BYTE=6).  Piece id IS the index — the property every tokenizer
runtime relies on.

The walk reuses the engine's protobuf wire-format machinery
(`operators/tfexample.py:_fields` — varint/length-delimited/fixed
decoding with bounds checks); unknown fields (TrainerSpec,
NormalizerSpec, self-test data) are skipped by the standard
ignore-unknown contract, so models written by any sentencepiece
version inventory correctly.  Tokenizer-fleet inventory is
header-small: a model file is KBs-to-MBs of metadata, never corpus
bytes.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame, SparkSession

from h2h_spark.operators.tfexample import _enc_varint, _fields, _ld
from h2h_spark.sources.util import list_part_files, strip_scheme

_PIECE_TYPES = {
    1: "NORMAL", 2: "UNKNOWN", 3: "CONTROL",
    4: "USER_DEFINED", 5: "UNUSED", 6: "BYTE",
}
_TYPE_IDS = {v: k for k, v in _PIECE_TYPES.items()}


def encode_spm_model(pieces) -> bytes:
    """Fixture/interop writer: serialize ``(piece, score, type_name)``
    tuples as a ModelProto holding only field 1 (what every reader
    needs; real models append TrainerSpec etc. as unknown fields)."""
    out = bytearray()
    for piece, score, type_name in pieces:
        body = _ld(1, piece.encode("utf-8"))
        body += _enc_varint((2 << 3) | 5) + struct.pack("<f", score)
        tid = _TYPE_IDS.get(type_name)
        if tid is None:
            raise ValueError(f"unknown piece type {type_name!r}")
        if tid != 1:  # NORMAL is the proto default
            body += _enc_varint(3 << 3) + _enc_varint(tid)
        out += _ld(1, bytes(body))
    return bytes(out)


def parse_spm_model(data: bytes) -> list[dict]:
    """Walk one ModelProto: returns ``[{piece, score, type}]`` in file
    order (= piece id order).  Loud on malformed piece submessages; a
    model with zero pieces is loud too (never a silently empty
    vocab)."""
    pieces: list[dict] = []
    for field, wt, val in _fields(data):
        if field != 1:
            continue  # TrainerSpec / NormalizerSpec / self-test data
        if wt != 2:
            raise ValueError(
                f"ModelProto field 1 has wire type {wt}, expected "
                "length-delimited"
            )
        piece = None
        score = 0.0
        ptype = 1
        for f2, w2, v2 in _fields(val):
            if f2 == 1 and w2 == 2:
                piece = v2.decode("utf-8")
            elif f2 == 2 and w2 == 5:
                score = struct.unpack("<f", v2)[0]
            elif f2 == 3 and w2 == 0:
                ptype = v2
        if piece is None:
            raise ValueError("SentencePiece submessage missing piece")
        if ptype not in _PIECE_TYPES:
            raise ValueError(f"unknown SentencePiece type id {ptype}")
        pieces.append({
            "piece": piece, "score": score,
            "type": _PIECE_TYPES[ptype],
        })
    if not pieces:
        raise ValueError("model holds no pieces — not a SentencePiece "
                         "model (or truncated)")
    return pieces


def spm_vocab(spark: SparkSession, path: str) -> DataFrame:
    """One row per piece per ``.model`` file under ``path``: ``(file,
    piece_id, piece, score, ptype)`` — piece_id is the file-order
    index.  One task per file batch."""
    files = sorted(list_part_files(path, pattern="*.model"))
    if not files:
        raise ValueError(f"no .model files under {path}")
    fdf = spark.createDataFrame(
        [(f,) for f in files], "file string"
    ).repartition(min(len(files), 64))

    def _run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for f in pdf["file"]:
                with open(strip_scheme(f), "rb") as fh:
                    pieces = parse_spm_model(fh.read())
                for i, p in enumerate(pieces):
                    rows.append((f, i, p["piece"], p["score"], p["type"]))
            yield pd.DataFrame(rows, columns=[
                "file", "piece_id", "piece", "score", "ptype",
            ])

    return fdf.mapInPandas(
        _run,
        "file string, piece_id bigint, piece string, score float, "
        "ptype string",
    )

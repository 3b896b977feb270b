"""Property/differential sweeps for the kernels the fixture-based gate
cannot see into (r9 verdict task 7 — this channel caught a REAL
wrong-answer bug in each of the last two rounds: NULL-text LM counts
r8, borderline-slack + subnormal-cosine r9):

- the d8 cross-doc span-rebuild kernel vs a from-scratch serial oracle
  over adversarial corpora (overlapping spans, periodic tokens,
  whole-doc copies, boundary-length docs);
- ``global_prefix_sum`` / ``pack_sequences`` vs serial cumsum under
  adversarial length distributions (zeros, 2^40 outliers, clustered
  order keys) at degenerate bucket counts;
- the multimodal decoders on truncated / bit-flipped / arbitrary
  payloads — the decode contract is "valid features or a TYPED error
  (ValueError / NotImplementedError)", never a struct/zlib/ZeroDivision
  crash from inside the Arrow batch loop.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# ---------------------------------------------------------------------
# d8: cross-document span dedup vs a serial oracle
# ---------------------------------------------------------------------

NGRAM = 3
WORDS = ["a", "b", "c", "ab"]


def _span_oracle(docs: dict[str, str], ngram: int):
    """Serial re-implementation of the d8 contract: every word span of
    length >= ngram occurring more than once in the corpus is kept at
    its first occurrence (min (doc_id, gpos), string order) and removed
    everywhere else; removal positions are the union of removed spans."""
    words = {i: t.split(" ") for i, t in docs.items()}
    occs: dict[str, list[tuple[str, int]]] = {}
    for i in sorted(words):
        ws = words[i]
        for p in range(len(ws) - ngram + 1):
            occs.setdefault(" ".join(ws[p:p + ngram]), []).append((i, p + 1))
    rm: dict[str, set[int]] = {}
    for g, lst in occs.items():
        if len(lst) > 1:
            keep = min(lst)
            for (i, p) in lst:
                if (i, p) != keep:
                    rm.setdefault(i, set()).update(range(p, p + ngram))
    out = {}
    for i, ws in words.items():
        kept = [w for k, w in enumerate(ws, 1) if k not in rm.get(i, set())]
        out[i] = (len(ws), len(kept), " ".join(kept))
    return out


@st.composite
def _corpora(draw):
    """Small adversarial corpora: periodic tokens (self-overlapping
    spans), shared prefixes/suffixes, exact copies, docs at the ngram
    boundary (len == ngram-1 / ngram / ngram+1)."""
    n_docs = draw(st.integers(min_value=1, max_value=6))
    docs = {}
    for d in range(n_docs):
        kind = draw(st.sampled_from(["random", "periodic", "copy"]))
        if kind == "copy" and docs:
            base = draw(st.sampled_from(sorted(docs)))
            words = docs[base].split(" ")
            # optionally perturb one end so the copy is near, not exact
            if draw(st.booleans()) and words:
                words = words[:-1] if draw(st.booleans()) else ["z"] + words
        elif kind == "periodic":
            unit = draw(st.lists(st.sampled_from(WORDS),
                                 min_size=1, max_size=2))
            reps = draw(st.integers(min_value=1, max_value=6))
            words = unit * reps
        else:
            words = draw(st.lists(st.sampled_from(WORDS),
                                  min_size=NGRAM - 1, max_size=9))
        docs[f"d{d}"] = " ".join(words)
    return docs


@given(_corpora())
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_cross_doc_span_dedup_matches_serial_oracle(spark, docs):
    from clickhouse_datafusion_spark.operators.dedup import (
        drop_cross_doc_spans)

    df = spark.createDataFrame(sorted(docs.items()), "doc_id string, text string")
    got = {r.doc_id: (r.n_words_before, r.n_words_after, r.text)
           for r in drop_cross_doc_spans(df, ngram=NGRAM).collect()}
    want = _span_oracle(docs, NGRAM)
    assert got == want, (docs, got, want)


# ---------------------------------------------------------------------
# global_prefix_sum / pack_sequences under adversarial distributions
# ---------------------------------------------------------------------

@st.composite
def _keyed_values(draw):
    """Unique int order keys with adversarial clustering (dense run +
    far outliers, negatives) and adversarial values (zeros, ones, 2^40
    outliers)."""
    n = draw(st.integers(min_value=1, max_value=40))
    base = draw(st.integers(min_value=-10**9, max_value=10**9))
    keys = set()
    while len(keys) < n:
        if draw(st.booleans()):
            keys.add(base + draw(st.integers(min_value=0, max_value=50)))
        else:
            keys.add(draw(st.integers(min_value=-10**12, max_value=10**12)))
    vals = [draw(st.sampled_from([0, 1, 7, 2**40]))
            for _ in range(len(keys))]
    return list(zip(sorted(keys), vals))


@given(_keyed_values(),
       st.sampled_from([1, 2, 5]),
       st.sampled_from(["quantile", "uniform"]))
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_global_prefix_sum_matches_serial_cumsum(spark, rows, n_buckets,
                                                 mode):
    from clickhouse_datafusion_spark.operators.packing import (
        global_prefix_sum)

    df = spark.createDataFrame(rows, "k bigint, v bigint").repartition(4)
    out = global_prefix_sum(df, "v", "k", n_buckets=n_buckets,
                            bounds_mode=mode)
    got = {r.k: r._cum_before for r in out.collect()}
    cum, want = 0, {}
    for k, v in rows:                      # rows arrive key-sorted
        want[k] = cum
        cum += v
    assert got == want, (rows, n_buckets, mode, got, want)


@given(st.lists(st.integers(min_value=0, max_value=5000),
                min_size=1, max_size=30),
       st.sampled_from([1, 64, 1024]))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_pack_sequences_offsets_under_adversarial_lengths(spark, lengths,
                                                          budget):
    """seq_id/seq_offset must be the exact concat-then-chunk layout for
    ANY length distribution — all-zero docs, one 5000-token giant among
    empties, budget 1 (every token its own sequence)."""
    from clickhouse_datafusion_spark.operators.packing import pack_sequences

    rows = [(i, n) for i, n in enumerate(lengths)]
    df = spark.createDataFrame(rows, "doc_id bigint, n bigint")
    out = {r.doc_id: (r.seq_id, r.seq_offset)
           for r in pack_sequences(df, budget=budget, token_col="n",
                                   id_col="doc_id", n_buckets=3).collect()}
    cum = 0
    for i, n in rows:
        assert out[i] == (cum // budget, cum % budget), (lengths, budget, i)
        cum += n


# ---------------------------------------------------------------------
# multimodal decoders: malformed / truncated / bit-flipped payloads
# ---------------------------------------------------------------------

_TYPED = (ValueError, NotImplementedError)


def _check_decode_contract(payload: bytes):
    """The per-row contract of the Arrow decode loop: a finite
    FEATURE_DIM vector or a TYPED error — any other exception class
    would kill the whole batch task at scale."""
    import math

    from clickhouse_datafusion_spark.operators.multimodal import (
        FEATURE_DIM,
        _decode_auto,
    )

    try:
        feats = _decode_auto(payload, strict=True)
    except _TYPED:
        return
    assert isinstance(feats, list) and len(feats) == FEATURE_DIM
    assert all(isinstance(x, float) and math.isfinite(x) for x in feats), \
        payload[:40]


def _valid_png() -> bytes:
    from clickhouse_datafusion_spark.operators.multimodal import encode_png

    pixels = bytes(range(0, 240, 10)) * 4          # 4x8 RGB
    return encode_png(8, 4, 3, pixels)


def _valid_ppm() -> bytes:
    from clickhouse_datafusion_spark.operators.multimodal import encode_ppm

    return encode_ppm(4, 3, bytes(range(36)))


def _valid_wav() -> bytes:
    import struct

    samples = struct.pack("<8h", *[0, 1000, -1000, 32767, -32768, 5, -5, 0])
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(samples)) + samples)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


@given(st.sampled_from(["png", "ppm", "wav"]), st.data())
@settings(max_examples=120, deadline=None)
def test_decoder_truncation_and_bitflip_never_crash_untyped(kind, data):
    """Every strict prefix and every single-byte corruption of a valid
    container must hit the typed-error path (or still decode) — never
    struct.error / zlib.error / ZeroDivisionError / IndexError."""
    payload = {"png": _valid_png, "ppm": _valid_ppm, "wav": _valid_wav}[kind]()
    if data.draw(st.booleans()):
        cut = data.draw(st.integers(min_value=0, max_value=len(payload) - 1))
        mutated = payload[:cut]
    else:
        pos = data.draw(st.integers(min_value=0, max_value=len(payload) - 1))
        val = data.draw(st.integers(min_value=0, max_value=255))
        mutated = payload[:pos] + bytes([val]) + payload[pos + 1:]
    _check_decode_contract(mutated)


@given(st.binary(min_size=0, max_size=200))
@settings(max_examples=150, deadline=None)
def test_decoder_arbitrary_bytes_never_crash_untyped(blob):
    _check_decode_contract(blob)


@given(st.binary(min_size=0, max_size=60))
@settings(max_examples=60, deadline=None)
def test_decoder_forged_headers_never_crash_untyped(tail):
    """Valid magic + arbitrary garbage after it — exercises the deep
    parse paths (chunk walks, header field reads) rather than the magic
    check."""
    from clickhouse_datafusion_spark.operators.multimodal import PNG_SIG

    for head in (b"RIFF" + tail[:4] + b"WAVE", b"P6", PNG_SIG):
        _check_decode_contract(head + tail)


def test_decoder_roundtrips_still_exact():
    """The mutation sweeps must not be satisfied by over-rejecting:
    the valid encodings keep decoding exactly."""
    from clickhouse_datafusion_spark.operators.multimodal import (
        decode_png,
        decode_ppm,
        decode_wav_pcm,
    )

    png = decode_png(_valid_png())
    assert (png["width"], png["height"], png["channels"]) == (8, 4, 3)
    assert png["pixels"] == bytes(range(0, 240, 10)) * 4
    ppm = decode_ppm(_valid_ppm())
    assert (ppm["width"], ppm["height"]) == (4, 3)
    assert ppm["pixels"] == bytes(range(36))
    wav = decode_wav_pcm(_valid_wav())
    assert wav["sample_rate"] == 8000 and len(wav["samples"]) == 8
    assert abs(wav["samples"][3] - 32767 / 32768) < 1e-12

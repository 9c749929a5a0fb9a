"""Round-10 WAV sample widths: the pure decode path reads ALL integer PCM
widths the format defines (8-bit unsigned, 16/32-bit signed LE, sign-extended
24-bit triplets), each normalized by its own full scale — so one waveform
fingerprints identically at any width. Pins: exact normalization values per
width, the synth multi-width corpus vs a driver-side replica, fingerprint ==
audio_pattern for every width cohort, and the honest gate for widths the
stdlib can parse but the normalizer doesn't know."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from kda_flink_demo_spark.operators.llm import imaging, synth_media
from kda_flink_demo_spark.operators.llm.image_dedup import audio_hash_bits, pack_bits_i64


def _wav(raw: bytes, sw: int, ch: int = 1, sr: int = 8000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(ch)
        wf.setsampwidth(sw)
        wf.setframerate(sr)
        wf.writeframes(raw)
    return buf.getvalue()


def test_normalization_pinned_per_width():
    """One waveform at four widths decodes to the same normalized values —
    the exact divisors (128 / 32768 / 2^23 / 2^31) and the 8-bit midpoint and
    24-bit sign extension are all load-bearing."""
    v16 = np.array([3072, -3072, 512, 0], dtype="<i2")
    _, nf, ch, s16 = imaging.decode_wav(_wav(v16.tobytes(), 2))
    assert (nf, ch) == (4, 1)
    assert np.array_equal(s16, np.array([3072, -3072, 512, 0]) / 32768.0)

    v8 = np.array([128 + 12, 128 - 12, 128 + 2, 128], dtype=np.uint8)
    _, _, _, s8 = imaging.decode_wav(_wav(v8.tobytes(), 1))
    assert np.array_equal(s8, np.array([12, -12, 2, 0]) / 128.0)

    vals24 = [786432, -786432, 131072, 0]
    raw24 = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals24)
    _, _, _, s24 = imaging.decode_wav(_wav(raw24, 3))
    assert np.array_equal(s24, np.array(vals24) / 8388608.0)
    # same waveform: 16-bit 3072/32768 == 24-bit 786432/8388608
    assert np.allclose(s24, s16)

    v32 = np.array([201326592, -201326592, 33554432, 0], dtype="<i4")
    _, _, _, s32 = imaging.decode_wav(_wav(v32.tobytes(), 4))
    assert np.allclose(s32, s16)


def test_unknown_width_gates_naming_librosa():
    """A hand-built RIFF/WAVE claiming 64-bit samples: stdlib wave parses the
    header, the normalizer must gate honestly rather than guess a divisor."""
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000 * 8, 8, 64)
    data = bytes(16)
    body = (
        b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    b = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(NotImplementedError, match="librosa"):
        imaging.decode_wav(b)


AMPS = {1: (25, 2), 2: (3000, 300), 3: (300_000, 30_000), 4: (80_000_000, 8_000_000)}


def _synth_width_payload(d: int) -> bytes:
    """Driver-side replica of synth_media.synth_wavs_widths' per-doc kernel."""
    s = 1 + (d // 20 % 4)
    bits = np.array(
        [(synth_media.audio_pattern(d) >> (63 - k)) & 1 for k in range(64)],
        dtype=np.uint8,
    )
    m8 = d % 8
    if m8 >= 4:
        vals = np.repeat(np.where(bits == 1, 3000 * s, 300 * s).astype(np.int64), 32)
        if m8 == 6:
            return imaging.encode_wav_ima_adpcm(vals)
        if m8 == 7:
            return imaging.encode_wav_ms_adpcm(vals)
        return imaging.encode_wav_g711(vals, "ulaw" if m8 == 4 else "alaw")
    sw = m8 + 1
    hi, lo = AMPS[sw]
    amp = np.where(bits == 1, hi * s, lo * s)
    vals = np.repeat(amp.astype(np.int64), 32)
    if sw == 1:
        raw = (128 + vals).astype(np.uint8).tobytes()
    elif sw == 2:
        raw = vals.astype("<i2").tobytes()
    elif sw == 3:
        raw = (
            np.stack([vals & 0xFF, (vals >> 8) & 0xFF, (vals >> 16) & 0xFF], axis=1)
            .astype(np.uint8)
            .tobytes()
        )
    else:
        raw = vals.astype("<i4").tobytes()
    return _wav(raw, sw)


def test_every_width_fingerprints_to_the_designed_pattern():
    for d in range(0, 120):
        got = int(pack_bits_i64(audio_hash_bits(_synth_width_payload(d))[None, :])[0])
        assert got & (2**64 - 1) == synth_media.audio_pattern(d), (d, d % 8)


# ---------------------------------------------------------------------------
# G.711 μ-law / A-law (stdlib wave refuses non-PCM; the manual RIFF walk +
# 256-entry expansion tables handle it)
# ---------------------------------------------------------------------------


def test_g711_tables_match_audioop_exactly():
    """External pin: Python 3.11 still ships audioop — both 256-entry
    expansion tables must match its G.711 decode byte-for-byte."""
    audioop = pytest.importorskip("audioop")
    ul = imaging._g711_ulaw_table()
    al = imaging._g711_alaw_table()
    for i in range(256):
        assert ul[i] == np.frombuffer(audioop.ulaw2lin(bytes([i]), 2), "<i2")[0]
        assert al[i] == np.frombuffer(audioop.alaw2lin(bytes([i]), 2), "<i2")[0]


@pytest.mark.parametrize("law", ["ulaw", "alaw"])
def test_g711_container_roundtrip_within_companding_error(law):
    rng = np.random.default_rng(1)
    s16 = rng.integers(-30000, 30000, 1024).astype(np.int64)
    sr, nf, ch, out = imaging.decode_wav(imaging.encode_wav_g711(s16, law))
    assert (sr, nf, ch) == (8000, 1024, 1)
    assert np.abs(out * 32768 - s16).max() < 2048  # largest G.711 segment step


def test_g711_sniff_routes_as_audio(spark):
    from kda_flink_demo_spark.operators.llm.multimodal import sniff_media_features

    vals = np.repeat(np.array([3000, 300] * 32, dtype=np.int64), 32)
    rows = [
        (0, imaging.encode_wav_g711(vals, "ulaw")),
        (1, imaging.encode_wav_g711(vals, "alaw")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: (r["modality"], r["channels"]) for r in
           sniff_media_features(df).collect()}
    assert got == {0: ("audio", 1), 1: ("audio", 1)}


def _raw_wav(tag: int, bits: int, data: bytes, ch: int = 1, sr: int = 8000) -> bytes:
    fmt = struct.pack("<HHIIHH", tag, ch, sr, sr * bits // 8, bits // 8, bits)
    body = (
        b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


@pytest.mark.parametrize("bits,dt", [(32, "<f4"), (64, "<f8")])
def test_ieee_float_wav_decodes_verbatim(bits, dt):
    vals = np.array([0.5, -0.25, 0.0625, -1.0], dtype=dt)
    sr, nf, ch, out = imaging.decode_wav(_raw_wav(3, bits, vals.tobytes()))
    assert (sr, nf, ch) == (8000, 4, 1)
    assert np.array_equal(out, vals.astype(np.float64))


def test_mp3_in_wav_fmt_tag_gates_naming_librosa():
    """MP3-in-WAV (fmt tag 0x55): a codec the pure path genuinely cannot
    decode — stdlib wave refuses it and the manual walk must gate honestly,
    not misparse. (MS-ADPCM, this test's former subject, decodes for real
    since r12 — see the tests below.)"""
    with pytest.raises(NotImplementedError, match="librosa"):
        imaging.decode_wav(_raw_wav(0x55, 4, bytes(16)))


# ---------------------------------------------------------------------------
# IMA-ADPCM (fmt tag 0x11): adaptive 4-bit quantization, block headers
# ---------------------------------------------------------------------------


def test_ima_nibble_codec_matches_audioop_exactly():
    """External pin: decode audioop's own IMA/DVI nibble stream with our
    step function — every reconstructed sample must match audioop's decoder
    bit-for-bit (same tables, same clamping, same index walk)."""
    audioop = pytest.importorskip("audioop")
    t = np.arange(2048)
    s16 = (9000 * np.sin(t / 17) + 2500 * np.sin(t / 5)).astype("<i2")
    adp, _ = audioop.lin2adpcm(s16.tobytes(), 2, None)
    ref = np.frombuffer(audioop.adpcm2lin(adp, 2, None)[0], dtype="<i2")
    pred, index = 0, 0
    ours = []
    for byte in adp:  # audioop packs the HIGH nibble first
        for nib in (byte >> 4, byte & 0x0F):
            pred, index = imaging._ima_step(pred, index, nib)
            ours.append(pred)
    assert np.array_equal(np.array(ours[: len(ref)]), ref)


def test_ima_adpcm_container_roundtrip_bounded():
    t = np.arange(4096)
    s16 = (10000 * np.sin(t / 20) + 3000 * np.sin(t / 7)).astype(np.int64)
    sr, nf, ch, out = imaging.decode_wav(imaging.encode_wav_ima_adpcm(s16))
    assert (sr, nf, ch) == (8000, 4096, 1)
    # adaptive quantization tracks a smooth waveform within ~few steps
    assert float(np.sqrt(np.mean((out * 32768 - s16) ** 2))) < 600


def test_ima_adpcm_sniff_routes_as_audio(spark):
    from kda_flink_demo_spark.operators.llm.multimodal import sniff_media_features

    vals = np.repeat(np.array([3000, 300] * 32, dtype=np.int64), 32)
    df = spark.createDataFrame(
        [(0, imaging.encode_wav_ima_adpcm(vals))], "doc_id long, payload binary"
    )
    [r] = sniff_media_features(df).collect()
    assert (r["modality"], r["channels"]) == ("audio", 1)


def test_synth_wavs_widths_kernel_matches_local_replica(spark):
    from tests.conftest import SF_DIR

    from kda_flink_demo_spark.io.sources import load_table

    docs = load_table(spark, SF_DIR, "documents").limit(40)
    rows = synth_media.synth_wavs_widths(docs).collect()
    assert len(rows) == 40
    for r in rows:
        assert bytes(r["payload"]) == _synth_width_payload(int(r["doc_id"]))


# ---------------------------------------------------------------------------
# MS-ADPCM (fmt tag 2): the Microsoft predictor family, decoded for real
# since r12 (it was the last WAV codec behind the librosa gate)
# ---------------------------------------------------------------------------


def _ms_adpcm_decode_reference(data: bytes, block_align: int) -> np.ndarray:
    """Independent straight-from-the-spec re-implementation (kept deliberately
    different in structure from imaging._decode_wav_ms_adpcm): nibble loop
    with explicit state, C-truncating division via int(float) semantics."""
    ADAPT = [230, 230, 230, 230, 307, 409, 512, 614,
             768, 614, 512, 409, 307, 230, 230, 230]
    COEFS = [(256, 0), (512, -256), (0, 0), (192, 64),
             (240, 0), (460, -208), (392, -232)]
    out = []
    for boff in range(0, len(data) - 6, block_align):
        blk = data[boff : boff + block_align]
        ipred = blk[0]
        delta = int.from_bytes(blk[1:3], "little", signed=True)
        s1 = int.from_bytes(blk[3:5], "little", signed=True)
        s2 = int.from_bytes(blk[5:7], "little", signed=True)
        c1, c2 = COEFS[ipred]
        out += [s2, s1]
        for byte in blk[7:]:
            for nib in (byte >> 4, byte & 0x0F):
                signed = nib - 16 if nib >= 8 else nib
                pred = int((s1 * c1 + s2 * c2) / 256)  # trunc toward zero
                samp = min(32767, max(-32768, pred + delta * signed))
                out.append(samp)
                s2, s1 = s1, samp
                delta = max(16, int(ADAPT[nib] * delta / 256))
    return np.array(out, dtype=np.int64)


def test_ms_adpcm_decoder_matches_independent_spec_replica():
    """Our decoder vs a structurally different spec replica, over random
    bitstreams (random nibbles, random seeds, every predictor index): every
    reconstructed sample bit-equal — pins nibble order (HIGH first), the
    C-division prediction, clamping, and the 16-entry adaptation walk."""
    rng = np.random.RandomState(12)
    for trial in range(8):
        block_align = 32
        blocks = []
        for _ in range(4):
            hdr = struct.pack(
                "<Bhhh",
                trial % 7,
                int(rng.randint(16, 4000)),
                int(rng.randint(-20000, 20000)),
                int(rng.randint(-20000, 20000)),
            )
            blocks.append(hdr + rng.bytes(block_align - 7))
        data = b"".join(blocks)
        ours = imaging._decode_wav_ms_adpcm(
            data, block_align, list(imaging._MS_ADPCM_COEFS), None
        )
        ref = _ms_adpcm_decode_reference(data, block_align)
        assert np.array_equal((ours * 32768.0).astype(np.int64), ref)


def test_ms_adpcm_container_roundtrip_bounded():
    t = np.arange(4096)
    s16 = (10000 * np.sin(t / 20) + 3000 * np.sin(t / 7)).astype(np.int64)
    sr, nf, ch, out = imaging.decode_wav(imaging.encode_wav_ms_adpcm(s16))
    assert (sr, nf, ch) == (8000, 4096, 1)
    # fixed predictor 0 + nearest-code quantization tracks a smooth waveform
    assert float(np.sqrt(np.mean((out * 32768 - s16) ** 2))) < 600


def test_ms_adpcm_sniff_routes_as_audio(spark):
    from kda_flink_demo_spark.operators.llm.multimodal import sniff_media_features

    vals = np.repeat(np.array([3000, 300] * 32, dtype=np.int64), 32)
    df = spark.createDataFrame(
        [(0, imaging.encode_wav_ms_adpcm(vals))], "doc_id long, payload binary"
    )
    [r] = sniff_media_features(df).collect()
    assert (r["modality"], r["channels"]) == ("audio", 1)


# ---------------------------------------------------------------------------
# Multichannel (r12): the fingerprint downmixes to mono, so a stereo
# re-encode of a clip collides with its mono source in the near-dup gate
# ---------------------------------------------------------------------------


def _stereo_wav(left: np.ndarray, right: np.ndarray) -> bytes:
    inter = np.empty(left.size * 2, dtype="<i2")
    inter[0::2], inter[1::2] = left, right
    return _wav(inter.tobytes(), 2, ch=2)


def test_stereo_reencode_fingerprints_equal_to_mono_source():
    d = 42
    amp = np.where(
        np.array([(synth_media.audio_pattern(d) >> (63 - k)) & 1 for k in range(64)]) == 1,
        3000, 300,
    )
    mono = np.repeat(amp.astype("<i2"), 32)
    mono_fp = int(pack_bits_i64(audio_hash_bits(_wav(mono.tobytes(), 2))[None, :])[0])
    # duplicated channels (the common mono→stereo upmix)
    dup_fp = int(pack_bits_i64(audio_hash_bits(_stereo_wav(mono, mono))[None, :])[0])
    # true stereo: attenuated right channel — the downmix scales every window
    # uniformly and the median threshold cancels the scale
    att_fp = int(
        pack_bits_i64(
            audio_hash_bits(_stereo_wav(mono, (mono // 2).astype("<i2")))[None, :]
        )[0]
    )
    assert dup_fp == mono_fp == att_fp
    assert mono_fp & (2**64 - 1) == synth_media.audio_pattern(d)


def test_stereo_sniff_reports_two_channels(spark):
    from kda_flink_demo_spark.operators.llm.multimodal import sniff_media_features

    mono = np.repeat(np.array([3000, 300] * 32, dtype="<i2"), 32)
    df = spark.createDataFrame(
        [(0, _stereo_wav(mono, mono))], "doc_id long, payload binary"
    )
    [r] = sniff_media_features(df).collect()
    assert (r["modality"], r["channels"]) == ("audio", 2)


# ---------------------------------------------------------------------------
# GSM 06.10 (r13): decoder vs an independent spec replica + container route
# ---------------------------------------------------------------------------


def _gsm_decode_reference(data: bytes) -> np.ndarray:
    """Independent straight-from-the-ETSI-spec GSM 06.10 decoder replica,
    deliberately different in structure from imaging's: whole-block big-int
    bit extraction, flat 120-sample LTP history with explicit index math,
    per-zone recomputation inline. Saturating 16-bit helpers written from
    the spec's ADD/MULT_R definitions."""

    def sat(x):
        return -32768 if x < -32768 else (32767 if x > 32767 else x)

    def multr(a, b):
        return 32767 if (a == b == -32768) else sat((a * b + (1 << 14)) >> 15)

    FAC = [18431, 20479, 22527, 24575, 26623, 28671, 30719, 32767]
    QLB = [3277, 11469, 21299, 32767]
    MIC = [-32, -32, -16, -16, -8, -8, -4, -4]
    BTAB = [0, 0, 2048, -2560, 94, -1792, -341, -1144]
    INVA = [13107, 13107, 13107, 13107, 19223, 17476, 31454, 29708]

    hist = [0] * 120
    nrp = 40
    larpp_prev = [0] * 8
    v = [0] * 9
    msr = 0
    out = []

    for boff in range(0, len(data) - 64, 65):
        big = int.from_bytes(data[boff : boff + 65], "big")
        for half in range(2):

            def fld(bit_off, n, _half=half, _big=big):
                start = _half * 260 + bit_off
                return (_big >> (520 - start - n)) & ((1 << n) - 1)

            widths = [6, 6, 5, 5, 4, 4, 3, 3]
            offs, larc, p = [], [], 0
            for w in widths:
                larc.append(fld(p, w))
                p += w
            wt = []
            for s in range(4):
                base = 36 + s * 56
                nc = fld(base, 7)
                bc = fld(base + 7, 2)
                mc = fld(base + 9, 2)
                xmaxc = fld(base + 11, 6)
                xmc = [fld(base + 17 + 3 * i, 3) for i in range(13)]
                # inverse APCM
                e = (xmaxc >> 3) - 1 if xmaxc > 15 else 0
                m = xmaxc - (e << 3)
                if m == 0:
                    e, m = -4, 7
                else:
                    while m <= 7:
                        m = (m << 1) | 1
                        e -= 1
                    m -= 8
                shift = 6 - e
                rnd = (1 << (shift - 1)) if shift >= 1 else 0
                ep = [0] * 40
                for i, c in enumerate(xmc):
                    t = sat(((c << 1) - 7) << 12)
                    ep[mc + 3 * i] = sat(multr(FAC[m], t) + rnd) >> shift
                # long-term synthesis
                if not (40 <= nc <= 120):
                    nc = nrp
                nrp = nc
                gain = QLB[bc]
                cur = []
                for k in range(40):
                    dr = sat(ep[k] + multr(gain, hist[120 - nc + k] if k < nc else cur[k - nc]))
                    cur.append(dr)
                wt += cur
                hist = hist[40:] + cur
            # LAR decode
            larpp = []
            for i in range(8):
                t = sat(sat(larc[i] + MIC[i]) << 10)
                t = sat(t - (BTAB[i] << 1))
                t = multr(INVA[i], t)
                larpp.append(sat(t + t))
            for ks, ke, wp, wc, half_of in (
                (0, 13, 2, 2, "prev"),
                (13, 27, 1, 1, None),
                (27, 40, 2, 2, "cur"),
                (40, 160, None, 0, None),
            ):
                rrp = []
                for i in range(8):
                    if wp is None:
                        larp = larpp[i]
                    else:
                        larp = sat((larpp_prev[i] >> wp) + (larpp[i] >> wc))
                        if half_of == "prev":
                            larp = sat(larp + (larpp_prev[i] >> 1))
                        elif half_of == "cur":
                            larp = sat(larp + (larpp[i] >> 1))
                    a = 32767 if larp == -32768 else abs(larp)
                    if a < 11059:
                        a = a << 1
                    elif a < 20070:
                        a = a + 11059
                    else:
                        a = sat((a >> 2) + 26112)
                    rrp.append(a if larp >= 0 else -a)
                for k in range(ks, ke):
                    sri = wt[k]
                    for i in range(8, 0, -1):
                        sri = sat(sri - multr(rrp[i - 1], v[i - 1]))
                        v[i] = sat(v[i - 1] + multr(rrp[i - 1], sri))
                    v[0] = sri
                    msr = sat(sri + multr(msr, 28180))
                    out.append(sat(msr + msr) & ~7)
            larpp_prev = larpp
    return np.array(out, dtype=np.int64)


def test_gsm_decoder_matches_independent_spec_replica():
    """imaging's GSM 06.10 decoder vs the structurally different replica
    over random 520-bit blocks (multi-block streams, state carried across
    frames): every sample bit-equal — pins the bit layout, inverse APCM
    normalization, LTP lag clamp + gain walk, LAR interpolation zones,
    lattice recursion, de-emphasis, and the final truncation."""
    rng = np.random.RandomState(31)
    for _ in range(6):
        data = rng.bytes(65 * 4)  # 4 blocks = 8 frames = 1280 samples
        ours = imaging._decode_wav_gsm(data, None)
        ref = _gsm_decode_reference(data)
        assert ours.shape[0] == 1280
        assert np.array_equal((ours * 32768.0).astype(np.int64), ref)


def _gsm_wav(data: bytes, sr: int = 8000, n_samples: int | None = None) -> bytes:
    n = n_samples if n_samples is not None else (len(data) // 65) * 320
    fmt = struct.pack("<HHIIHHHH", 0x31, 1, sr, sr * 65 // 320, 65, 0, 2, 320)
    riff = (
        b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, n)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def test_gsm_wav_container_and_sniff_route(spark):
    """decode_wav must route fmt tag 0x31 through the GSM chain (sample
    count from the fact chunk), a silent bitstream must decode to exact
    silence, and the sniff scan must tag a GSM WAV as audio — while the
    remaining gate names only MP3-in-WAV."""
    from kda_flink_demo_spark.operators.llm.multimodal import sniff_media_features

    rng = np.random.RandomState(7)
    data = rng.bytes(65 * 3)
    sr, nf, ch, samples = imaging.decode_wav(_gsm_wav(data, n_samples=900))
    assert (sr, nf, ch) == (8000, 900, 1)
    assert samples.shape[0] == 900 and float(np.abs(samples).max()) <= 1.0

    # NEAR-silence frame, constructed: RPE codes are ±odd (no zero code),
    # so true digital silence is impossible — the quietest encoding is
    # xmaxc=0 with midpoint pulses (xMc=3 ⇒ −xmax/8 ≈ −4 LSB) and LAR codes
    # whose decoded log-area ratios ≈ 0 (near-identity synthesis filter)
    def pack_frame():
        bits = []

        def put(v, n):
            bits.extend((v >> (n - 1 - i)) & 1 for i in range(n))

        for v, n in zip([32, 32, 20, 11, 8, 5, 3, 2], [6, 6, 5, 5, 4, 4, 3, 3]):
            put(v, n)
        for _ in range(4):
            put(40, 7)  # valid lag
            put(0, 2)   # smallest LTP gain
            put(0, 2)
            put(0, 6)   # xmaxc = 0
            for _ in range(13):
                put(3, 3)  # midpoint pulse codes
        return bits

    fbits = pack_frame() * 2
    quiet_block = bytes(
        sum(fbits[i * 8 + j] << (7 - j) for j in range(8)) for i in range(65)
    )
    _, _, _, quiet = imaging.decode_wav(_gsm_wav(quiet_block * 2))
    assert float(np.abs(quiet).max()) < 0.02, float(np.abs(quiet).max())

    df = spark.createDataFrame(
        [(0, bytearray(_gsm_wav(data)))], "doc_id long, payload binary"
    )
    row = sniff_media_features(df).collect()[0]
    assert row.modality == "audio" and row.channels == 1

    import pytest as _pytest

    mp3ish = bytearray(_gsm_wav(data))
    mp3ish[20:22] = struct.pack("<H", 0x55)  # fmt tag -> MPEG Layer 3
    with _pytest.raises(NotImplementedError, match="librosa"):
        imaging.decode_wav(bytes(mp3ish))

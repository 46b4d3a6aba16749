"""Analytic FLOP counts for the diarization hot path (VERDICT r3 item 3).

Every stage of the flagship SpeakerDiarization pipeline runs fixed-shape
programs, so device FLOPs are closed-form. These counters model the work
as EXECUTED on device — including batch padding (256-chunk buckets with
an optional 128 half tail), trunk panel halos, and whole-file vs
per-chunk front-ends — so achieved TFLOP/s = flops / wall_seconds is an
honest throughput number and MFU = achieved / peak is comparable across
rounds.

Conventions: 1 MAC = 2 FLOPs; elementwise/normalization/pooling work is
ignored (<<1% next to the conv/matmul stages); counts are NOMINAL — the
fbank composed conv and mel matmul run at Precision.HIGHEST (~6 MXU
passes per f32 product), so end-to-end MFU vs the bf16 peak understates
those stages by design.

Structural constants mirror the live modules (models/blocks/sincnet.py,
models/segmentation/pyannet.py, models/embedding/wespeaker.py,
pipelines/speaker_diarization.py TRUNK_PANEL_*); the sanity test
(tests/test_flops.py) cross-checks the conv counters against XLA's HLO
cost analysis on CPU.
"""

from __future__ import annotations

from typing import Dict, Sequence

SINC_KERNEL = 251
SINC_FILTERS = 80


def conv1d_flops(frames_out: int, kernel: int, cin: int, cout: int) -> int:
    """Dense 1-D convolution: 2 * K * Cin * Cout * frames_out."""
    return 2 * kernel * cin * cout * frames_out


def conv2d_flops(h_out: int, w_out: int, kh: int, kw: int,
                 cin: int, cout: int) -> int:
    return 2 * kh * kw * cin * cout * h_out * w_out


def lstm_flops(seq_len: int, input_sizes: Sequence[int], hidden: int,
               bidirectional: bool = True) -> int:
    """Gate matmuls only (4H x (I+H) per step per direction); the
    elementwise gate math is ~1% of that at H=128."""
    dirs = 2 if bidirectional else 1
    macs_per_step = sum(4 * hidden * (i + hidden) for i in input_sizes)
    return 2 * macs_per_step * dirs * seq_len


def conv1d_out(n: int, kernel: int, stride: int = 1) -> int:
    """VALID conv / pool output length."""
    return (n - kernel) // stride + 1 if n >= kernel else 0


# ---------------------------------------------------------------- PyanNet


def sincnet_whole_conv_flops(num_samples: int, stride: int = 10) -> int:
    """Shared front-end: ONE sinc conv over the (padded) whole file
    (models/blocks/sincnet.py whole_conv)."""
    return conv1d_flops(conv1d_out(num_samples, SINC_KERNEL, stride),
                        SINC_KERNEL, 1, SINC_FILTERS)


def pyannet_post_sinc_flops(window_samples: int = 160000,
                            stride: int = 10,
                            lstm_hidden: int = 128,
                            lstm_layers: int = 2,
                            linear_hidden: int = 128,
                            linear_layers: int = 2,
                            dimension: int = 7) -> Dict[str, int]:
    """Per-chunk work AFTER the shared sinc conv: the two 60-filter convs,
    the BiLSTM, and the linear head (models/segmentation/pyannet.py)."""
    f = conv1d_out(window_samples, SINC_KERNEL, stride)   # gathered frames
    f = f // 3                                            # max-pool 3
    conv1 = conv1d_flops(conv1d_out(f, 5), 5, SINC_FILTERS, 60)
    f = conv1d_out(f, 5) // 3
    conv2 = conv1d_flops(conv1d_out(f, 5), 5, 60, 60)
    f = conv1d_out(f, 5) // 3                             # LSTM seq length
    inputs = [60] + [2 * lstm_hidden] * (lstm_layers - 1)
    lstm = lstm_flops(f, inputs, lstm_hidden, bidirectional=True)
    widths = [2 * lstm_hidden] + [linear_hidden] * linear_layers
    head = 2 * f * sum(a * b for a, b in
                       zip(widths, widths[1:] + [dimension]))
    return {"convs": conv1 + conv2, "lstm": lstm, "head": head,
            "frames": f}


# ------------------------------------------------------- WeSpeaker ResNet


def fbank_conv_flops(num_frames: int, window: int = 400,
                     padded: int = 512, num_mel_bins: int = 80) -> int:
    """Composed-conv fbank (ops/fbank.py): one (window, 2*(padded/2+1))
    strided conv + the (freq, mel) matmul."""
    nk = padded // 2 + 1
    dft = conv1d_flops(num_frames, window, 1, 2 * nk)
    mel = 2 * num_frames * nk * num_mel_bins
    return dft + mel


def resnet_trunk_flops_per_frame(m_channels: int = 32,
                                 num_blocks: Sequence[int] = (3, 4, 6, 3),
                                 freq: int = 80,
                                 bottleneck: bool = False) -> int:
    """Trunk FLOPs per INPUT fbank frame (time dim scales linearly).

    Mirrors models/embedding/wespeaker.py ResNetTrunk: 3x3 stem then four
    stages at channel multipliers (1, 2, 4, 8) and strides (1, 2, 2, 2)
    applied to BOTH time and frequency.
    """
    total = float(conv2d_flops(1, freq, 3, 3, 1, m_channels))  # stem
    cin = m_channels
    t_scale = 1.0                                           # time downsample
    w = freq
    for blocks, mult, stride in zip(num_blocks, (1, 2, 4, 8), (1, 2, 2, 2)):
        mid = m_channels * mult
        cout = mid * (4 if bottleneck else 1)
        for b in range(blocks):
            s = stride if b == 0 else 1
            area_in = t_scale * w                           # before stride
            t_scale /= s
            w = -(-w // s)
            area_out = t_scale * w
            if bottleneck:
                # 1x1 (full res) -> 3x3 stride s -> 1x1 (reduced res)
                total += area_in * 2 * cin * mid
                total += area_out * (2 * 9 * mid * mid + 2 * mid * cout)
            else:
                # 3x3 stride s -> 3x3 (both at reduced res)
                total += area_out * (2 * 9 * cin * mid + 2 * 9 * mid * mid)
            if s != 1 or cin != cout:
                total += area_out * 2 * cin * cout          # 1x1 downsample
            cin = cout
    return int(total)


# ------------------------------------------------------------ aggregation


def _tail_padded(n_chunks: int, batch: int = 256) -> int:
    """Executed chunk count: full batches of ``batch`` plus the tail
    padded by the inference engine's own rule (so the FLOPs model can
    never drift from what actually executes)."""
    from ..core.inference import _tail_pad_to

    full, rem = divmod(n_chunks, batch)
    if rem == 0:
        return n_chunks
    return full * batch + _tail_pad_to(batch, rem)


def diarization_device_flops(
        file_seconds: float,
        sample_rate: int = 16000,
        window: float = 10.0,
        step: float = 1.0,
        batch: int = 256,
        local_speakers: int = 3,
        trunk_core: int = 512,
        trunk_halo: int = 64,
        trunk_pbatch: int = 8,
        trunk_stride: int = 8,
        embed_dim: int = 256,
) -> Dict[str, int]:
    """Per-stage device FLOPs for ONE file through the flagship pipeline
    (PyanNet powerset + WeSpeakerResNet34 + clustering), with the
    accelerator defaults: shared sinc front-end, shared whole-file
    fbank/trunk panels, 256-chunk buckets + half tail."""
    n = int(file_seconds * sample_rate)
    win = int(window * sample_rate)
    hop = int(step * sample_rate)
    # exact _chunk_grid math (core/inference.py:210-231)
    num_full = 1 + (n - win) // hop if n >= win else 0
    has_last = (n < win) or ((n - win) % hop > 0)
    n_chunks = num_full + int(has_last)
    needed = (n_chunks - 1) * hop + win
    bucket = 30 * sample_rate
    padded = max(needed, -(-needed // bucket) * bucket)     # 30 s buckets
    executed = _tail_padded(n_chunks, batch)

    seg = pyannet_post_sinc_flops(win)
    per_chunk = seg["convs"] + seg["lstm"] + seg["head"]

    fbank_frames = conv1d_out(padded, 400, 160)
    trunk_total = -(-fbank_frames // trunk_stride)
    n_panels = -(-trunk_total // trunk_core)
    n_pbatches = -(-n_panels // trunk_pbatch)
    panel_in = (trunk_core + 2 * trunk_halo) * trunk_stride
    trunk_frames_executed = n_pbatches * trunk_pbatch * panel_in
    per_frame = resnet_trunk_flops_per_frame()
    # masked stats-pool + seg_1 dense per (chunk, speaker): pooled dim is
    # 256 channels x 10 freq = 2560, doubled (mean+std) into embed_dim
    pool_dim = 2560
    pool = executed * local_speakers * (
        2 * (int(window / 0.01) // trunk_stride) * pool_dim
        + 2 * 2 * pool_dim * embed_dim)

    return {
        "sinc_whole_conv": sincnet_whole_conv_flops(padded),
        "segmentation": per_chunk * executed,
        "fbank": fbank_conv_flops(fbank_frames),
        "trunk": per_frame * trunk_frames_executed,
        "pool_and_embed": pool,
        "chunks": n_chunks,
        "chunks_executed": executed,
        "fbank_frames": fbank_frames,
        "trunk_frames_executed": trunk_frames_executed,
    }


def total_flops(stages: Dict[str, int]) -> int:
    return sum(v for k, v in stages.items()
               if k in ("sinc_whole_conv", "segmentation", "fbank",
                        "trunk", "pool_and_embed"))


# v5e bf16 peak (Google published): 197 TFLOP/s per chip
V5E_BF16_PEAK = 197e12


# ------------------------------------------------------------------- HBM


def diarization_resident_hbm_bytes(
        file_seconds: float,
        sample_rate: int = 16000,
        window: float = 10.0,
        step: float = 1.0,
        trunk_stride: int = 8,
        fixed_bytes: int = 192 * 1024 * 1024,
) -> Dict[str, int]:
    """Analytic model of RESIDENT device arrays while one file is in
    flight through the flagship pipeline (accelerator defaults: shared
    sinc front-end, whole-file fbank + trunk panels, dpcm4 transport).

    This counts named whole-file buffers + a fixed term for params and
    the 256-chunk working batch; XLA executable scratch (fusion temps)
    is NOT modeled — the number is the floor the whole-file design pins
    in HBM, which is what gates the long-file ceiling (VERDICT r4
    missing #2). Terms mirror pipelines/speaker_diarization.py
    _start_shared_trunk/get_embeddings and core/inference.py
    _upload_waveform_cached.
    """
    n = int(file_seconds * sample_rate)
    win = int(window * sample_rate)
    hop = int(step * sample_rate)
    num_full = 1 + (n - win) // hop if n >= win else 0
    has_last = (n < win) or ((n - win) % hop > 0)
    n_chunks = num_full + int(has_last)
    needed = (n_chunks - 1) * hop + win
    bucket = 30 * sample_rate
    padded = max(needed, -(-needed // bucket) * bucket)

    sinc_frames = conv1d_out(padded, SINC_KERNEL, 10)
    fbank_frames = conv1d_out(padded, 400, 160)
    trunk_frames = -(-fbank_frames // trunk_stride)
    terms = {
        # f32 device waveform (cached per file: _device_waveform)
        "waveform_f32": padded * 4,
        # int16 buffer the dpcm4 segmented-cumsum decode emits (lives
        # alongside the f32 conversion output)
        "waveform_int16": padded * 2,
        # shared sinc conv features, 80 filters f32 at stride 10
        "sinc_features": sinc_frames * SINC_FILTERS * 4,
        # whole-file log-mel fbank, 80 bins f32
        "fbank": fbank_frames * 80 * 4,
        # whole-file ResNet trunk panels: 256 ch x 10 freq = 2560 f32
        "trunk_panels": trunk_frames * 2560 * 4,
        # params + compiled-program constants + one 256-chunk gathered
        # batch (256 x 10 s x f32 = 164 MB) — size-independent
        "fixed": fixed_bytes + 256 * win * 4,
    }
    terms["total"] = sum(terms.values())
    return terms

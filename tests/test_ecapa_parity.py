"""Golden parity: native flax ECAPA-TDNN vs a torch replica of
speechbrain.lobes.models.ECAPA_TDNN.

speechbrain itself is not installed in this environment, so the replica
below is written FROM THE SPEECHBRAIN SOURCE LAYOUT (wrapper modules
nesting the raw torch layers: Conv1d -> ``.conv``, BatchNorm1d ->
``.norm``; reflect 'same' padding; symmetric-triangle mel filterbank;
masked -inf softmax attention) — not from our flax module — per the
session-5 replica rule. Its ``state_dict()`` keys therefore match real
speechbrain ``embedding_model.ckpt`` files, which also locks the
converter's key mapping.

Reference dispatch being closed: /root/reference/src/pyannote/audio/
pipelines/speaker_verification.py:202-383 (SpeechBrain backend).
"""

from __future__ import annotations

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

# tiny config: keeps the cold CPU compile + forward under a few seconds
CFG = dict(n_mels=24, channels=(32, 32, 32, 32, 96),
           kernel_sizes=(5, 3, 3, 3, 1), dilations=(1, 2, 3, 4, 1),
           attention_channels=16, res2net_scale=4, se_channels=16,
           global_context=True, lin_neurons=32)


# ---------------------------------------------------------------------------
# torch replica (speechbrain layer/key layout)
# ---------------------------------------------------------------------------

class SBConv1d(nn.Module):
    """speechbrain.nnet.CNN.Conv1d: 'same' reflect padding, inner .conv."""

    def __init__(self, in_ch, out_ch, k, dilation=1):
        super().__init__()
        self.conv = nn.Conv1d(in_ch, out_ch, k, dilation=dilation)
        self.k, self.d = k, dilation

    def forward(self, x):                       # (B, C, T)
        pad = self.d * (self.k - 1) // 2
        if pad:
            x = F.pad(x, (pad, pad), mode="reflect")
        return self.conv(x)


class SBBatchNorm1d(nn.Module):
    def __init__(self, size):
        super().__init__()
        self.norm = nn.BatchNorm1d(size)

    def forward(self, x):
        return self.norm(x)


class TDNNBlock(nn.Module):
    def __init__(self, in_ch, out_ch, k, dilation):
        super().__init__()
        self.conv = SBConv1d(in_ch, out_ch, k, dilation)
        self.activation = nn.ReLU()
        self.norm = SBBatchNorm1d(out_ch)

    def forward(self, x):
        return self.norm(self.activation(self.conv(x)))


class Res2NetBlock(nn.Module):
    def __init__(self, in_ch, out_ch, scale, k, dilation):
        super().__init__()
        self.blocks = nn.ModuleList(
            [TDNNBlock(in_ch // scale, out_ch // scale, k, dilation)
             for _ in range(scale - 1)])
        self.scale = scale

    def forward(self, x):
        y = []
        y_i = None
        for i, x_i in enumerate(torch.chunk(x, self.scale, dim=1)):
            if i == 0:
                y_i = x_i
            elif i == 1:
                y_i = self.blocks[i - 1](x_i)
            else:
                y_i = self.blocks[i - 1](x_i + y_i)
            y.append(y_i)
        return torch.cat(y, dim=1)


def _length_mask(lengths, L):
    """speechbrain length_to_mask: arange(L) < rel_length * L."""
    return (torch.arange(L)[None, :].float()
            < lengths[:, None] * L).float()


class SEBlock(nn.Module):
    def __init__(self, in_ch, se_ch, out_ch):
        super().__init__()
        self.conv1 = SBConv1d(in_ch, se_ch, 1)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = SBConv1d(se_ch, out_ch, 1)
        self.sigmoid = nn.Sigmoid()

    def forward(self, x, lengths=None):
        L = x.shape[-1]
        if lengths is not None:
            mask = _length_mask(lengths, L).unsqueeze(1)
            total = mask.sum(dim=2, keepdim=True)
            s = (x * mask).sum(dim=2, keepdim=True) / total
        else:
            s = x.mean(dim=2, keepdim=True)
        s = self.relu(self.conv1(s))
        s = self.sigmoid(self.conv2(s))
        return s * x


class AttentiveStatisticsPooling(nn.Module):
    def __init__(self, channels, attention_channels, global_context=True):
        super().__init__()
        self.eps = 1e-12
        self.global_context = global_context
        self.tdnn = TDNNBlock(
            channels * 3 if global_context else channels,
            attention_channels, 1, 1)
        self.tanh = nn.Tanh()
        self.conv = SBConv1d(attention_channels, channels, 1)

    def forward(self, x, lengths=None):
        L = x.shape[-1]

        def stats(values, m):
            mean = (m * values).sum(2)
            std = torch.sqrt(
                (m * (values - mean.unsqueeze(2)).pow(2)).sum(2)
                .clamp(self.eps))
            return mean, std

        if lengths is None:
            lengths = torch.ones(x.shape[0])
        mask = _length_mask(lengths, L).unsqueeze(1)
        if self.global_context:
            total = mask.sum(dim=2, keepdim=True)
            mean, std = stats(x, mask / total)
            mean = mean.unsqueeze(2).repeat(1, 1, L)
            std = std.unsqueeze(2).repeat(1, 1, L)
            attn = torch.cat([x, mean, std], dim=1)
        else:
            attn = x
        attn = self.conv(self.tanh(self.tdnn(attn)))
        attn = attn.masked_fill(mask == 0, float("-inf"))
        attn = F.softmax(attn, dim=2)
        mean, std = stats(x, attn)
        return torch.cat((mean, std), dim=1).unsqueeze(2)


class SERes2NetBlock(nn.Module):
    def __init__(self, in_ch, out_ch, scale, se_ch, k, dilation):
        super().__init__()
        self.tdnn1 = TDNNBlock(in_ch, out_ch, 1, 1)
        self.res2net_block = Res2NetBlock(out_ch, out_ch, scale, k,
                                          dilation)
        self.tdnn2 = TDNNBlock(out_ch, out_ch, 1, 1)
        self.se_block = SEBlock(out_ch, se_ch, out_ch)
        self.shortcut = SBConv1d(in_ch, out_ch, 1) if in_ch != out_ch \
            else None

    def forward(self, x, lengths=None):
        residual = self.shortcut(x) if self.shortcut is not None else x
        x = self.tdnn1(x)
        x = self.res2net_block(x)
        x = self.tdnn2(x)
        x = self.se_block(x, lengths)
        return x + residual


class TorchECAPA(nn.Module):
    """speechbrain.lobes.models.ECAPA_TDNN.ECAPA_TDNN replica."""

    def __init__(self, n_mels, channels, kernel_sizes, dilations,
                 attention_channels, res2net_scale, se_channels,
                 global_context, lin_neurons):
        super().__init__()
        self.blocks = nn.ModuleList()
        self.blocks.append(
            TDNNBlock(n_mels, channels[0], kernel_sizes[0], dilations[0]))
        for i in range(1, len(channels) - 1):
            self.blocks.append(SERes2NetBlock(
                channels[i - 1], channels[i], res2net_scale, se_channels,
                kernel_sizes[i], dilations[i]))
        self.mfa = TDNNBlock(channels[-1], channels[-1], kernel_sizes[-1],
                             dilations[-1])
        self.asp = AttentiveStatisticsPooling(
            channels[-1], attention_channels, global_context)
        self.asp_bn = SBBatchNorm1d(channels[-1] * 2)
        self.fc = SBConv1d(channels[-1] * 2, lin_neurons, 1)

    def forward(self, x, lengths=None):        # x (B, T, F)
        x = x.transpose(1, 2)
        xl = []
        for layer in self.blocks:
            try:
                x = layer(x, lengths=lengths)
            except TypeError:
                x = layer(x)
            xl.append(x)
        x = torch.cat(xl[1:], dim=1)
        x = self.mfa(x)
        x = self.asp(x, lengths=lengths)
        x = self.asp_bn(x)
        x = self.fc(x)
        return x.transpose(1, 2)               # (B, 1, lin)


def _randomize(replica: nn.Module, seed: int = 0) -> None:
    """Non-default weights AND running stats so conversion is exercised."""
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in replica.modules():
            if isinstance(m, nn.BatchNorm1d):
                m.weight.normal_(1.0, 0.2, generator=gen)
                m.bias.normal_(0.0, 0.2, generator=gen)
                m.running_mean.normal_(0.0, 0.5, generator=gen)
                m.running_var.uniform_(0.5, 2.0, generator=gen)
            elif isinstance(m, nn.Conv1d):
                m.weight.normal_(0.0, 0.2, generator=gen)
                if m.bias is not None:
                    m.bias.normal_(0.0, 0.2, generator=gen)
    replica.eval()


def _sentence_norm(feats: torch.Tensor,
                   lengths=None) -> torch.Tensor:
    """speechbrain InputNormalization(sentence, std_norm=False)."""
    if lengths is None:
        return feats - feats.mean(dim=1, keepdim=True)
    out = feats.clone()
    for i in range(feats.shape[0]):
        n = int(torch.round(lengths[i] * feats.shape[1]))
        out[i] = feats[i] - feats[i, :n].mean(dim=0)
    return out


def _native_model():
    from pyannote_audio_tpu.models.embedding.ecapa import ECAPA_TDNN
    model = ECAPA_TDNN(**CFG)
    model.build()
    return model


def _convert(model, replica):
    state = {k: v.detach().numpy() for k, v in replica.state_dict().items()}
    model.params = model.convert_speechbrain_state_dict(state)
    model._jitted_apply = None
    return model


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_speechbrain_fbank_golden():
    """Native fbank vs a torch.stft replica of speechbrain Fbank."""
    from pyannote_audio_tpu.ops.fbank import speechbrain_fbank

    rng = np.random.default_rng(0)
    wav = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
    ours = np.asarray(speechbrain_fbank(wav, n_mels=24))

    t = torch.from_numpy(wav)
    stft = torch.stft(t, n_fft=400, hop_length=160, win_length=400,
                      window=torch.hamming_window(400), center=True,
                      pad_mode="constant", normalized=False,
                      onesided=True, return_complex=True)
    power = (stft.real ** 2 + stft.imag ** 2).transpose(1, 2)  # (B,T,F)

    # symmetric-triangle filterbank (speechbrain Filterbank semantics)
    def to_mel(hz):
        return 2595.0 * np.log10(1.0 + hz / 700.0)

    def to_hz(mel):
        return 700.0 * (10.0 ** (mel / 2595.0) - 1.0)

    hz = to_hz(np.linspace(to_mel(0.0), to_mel(8000.0), 24 + 2))
    band = (hz[1:] - hz[:-1])[:-1]
    f_central = hz[1:-1]
    all_freqs = np.linspace(0, 8000, 201)
    slope = (all_freqs[:, None] - f_central[None, :]) / band[None, :]
    banks = np.maximum(0.0, np.minimum(slope + 1, -slope + 1))
    mel = power @ torch.from_numpy(banks.astype(np.float32))
    x_db = 10.0 * torch.log10(mel.clamp(min=1e-10))
    floor = x_db.amax(dim=(-2, -1), keepdim=True) - 80.0
    theirs = torch.max(x_db, floor).numpy()

    assert ours.shape == theirs.shape == (2, 101, 24)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-3)


def test_ecapa_golden_unmasked():
    replica = TorchECAPA(**CFG)
    _randomize(replica)
    model = _convert(_native_model(), replica)

    rng = np.random.default_rng(1)
    feats = rng.standard_normal((3, 50, CFG["n_mels"])).astype(np.float32)

    with torch.no_grad():
        normed = _sentence_norm(torch.from_numpy(feats))
        theirs = replica(normed).squeeze(1).numpy()
    ours = np.asarray(model.module.apply(model.params,
                                         np.asarray(feats)))
    assert ours.shape == theirs.shape == (3, CFG["lin_neurons"])
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-4)


def test_ecapa_golden_masked():
    """Relative lengths -> binary frame masks match the torch replica."""
    replica = TorchECAPA(**CFG)
    _randomize(replica, seed=2)
    model = _convert(_native_model(), replica)

    rng = np.random.default_rng(3)
    T = 48
    feats = rng.standard_normal((2, T, CFG["n_mels"])).astype(np.float32)
    lengths = torch.tensor([0.5, 1.0])

    with torch.no_grad():
        normed = _sentence_norm(torch.from_numpy(feats), lengths)
        theirs = replica(normed, lengths=lengths).squeeze(1).numpy()
    mask = (np.arange(T)[None, :]
            < lengths.numpy()[:, None] * T).astype(np.float32)
    ours = np.asarray(model.module.apply(model.params, np.asarray(feats),
                                         mask=np.asarray(mask)))
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-4)


def test_export_roundtrip():
    """export_speechbrain_state_dict loads back into the torch replica."""
    replica = TorchECAPA(**CFG)
    _randomize(replica, seed=4)
    model = _convert(_native_model(), replica)

    exported = model.export_speechbrain_state_dict()
    replica2 = TorchECAPA(**CFG)
    replica2.load_state_dict(
        {k: torch.from_numpy(np.array(v)) for k, v in exported.items()})
    replica2.eval()
    x = torch.randn(2, 40, CFG["n_mels"], generator=torch.Generator()
                    .manual_seed(5))
    with torch.no_grad():
        np.testing.assert_allclose(replica(x).numpy(),
                                   replica2(x).numpy(),
                                   rtol=1e-6, atol=1e-6)


def test_from_speechbrain_snapshot(tmp_path):
    """hyperparams.yaml + embedding_model.ckpt dir loads natively and
    the inferred config matches; factory routes the dir to the
    SpeechBrain wrapper."""
    replica = TorchECAPA(**CFG)
    _randomize(replica, seed=6)
    torch.save(replica.state_dict(), tmp_path / "embedding_model.ckpt")
    (tmp_path / "hyperparams.yaml").write_text(
        "n_mels: 24\n"
        "emb_dim: 32\n"
        "embedding_model: !new:speechbrain.lobes.models.ECAPA_TDNN."
        "ECAPA_TDNN\n"
        "    input_size: !ref <n_mels>\n"
        "    channels: [32, 32, 32, 32, 96]\n"
        "    kernel_sizes: [5, 3, 3, 3, 1]\n"
        "    dilations: [1, 2, 3, 4, 1]\n"
        "    attention_channels: 16\n"
        "    lin_neurons: 32\n")

    from pyannote_audio_tpu.models.embedding.ecapa import ECAPA_TDNN
    model = ECAPA_TDNN.from_speechbrain(tmp_path)
    assert model.channels == CFG["channels"]
    assert model.dilations == CFG["dilations"]
    assert model.res2net_scale == CFG["res2net_scale"]
    assert model.se_channels == CFG["se_channels"]
    assert model.lin_neurons == CFG["lin_neurons"]
    assert model.global_context is True

    # end to end on raw audio: native fbank + sentence norm + trunk
    rng = np.random.default_rng(7)
    wav = (0.1 * rng.standard_normal((2, 1, 16000))).astype(np.float32)
    emb = np.asarray(model(wav))
    assert emb.shape == (2, CFG["lin_neurons"])
    assert np.isfinite(emb).all()

    from pyannote_audio_tpu.pipelines.speaker_verification import (
        PretrainedSpeakerEmbedding, SpeechBrainPretrainedSpeakerEmbedding)
    wrapper = PretrainedSpeakerEmbedding(str(tmp_path))
    assert isinstance(wrapper, SpeechBrainPretrainedSpeakerEmbedding)
    assert wrapper.dimension == CFG["lin_neurons"]
    assert wrapper.metric == "cosine"

    out = wrapper(wav)
    np.testing.assert_allclose(out, emb, rtol=1e-5, atol=1e-5)


def test_speechbrain_wrapper_mask_semantics(tmp_path):
    """Masked call compacts speech samples (reference :348-362); the
    result equals an unmasked call on the manually compacted signal, and
    too-short speakers get NaN embeddings."""
    replica = TorchECAPA(**CFG)
    _randomize(replica, seed=8)
    torch.save(replica.state_dict(), tmp_path / "embedding_model.ckpt")

    from pyannote_audio_tpu.pipelines.speaker_verification import \
        SpeechBrainPretrainedSpeakerEmbedding
    wrapper = SpeechBrainPretrainedSpeakerEmbedding(str(tmp_path))

    rng = np.random.default_rng(9)
    S = 16000
    wav = (0.1 * rng.standard_normal((2, 1, S))).astype(np.float32)
    # item 0: first half speech; item 1: all speech
    masks = np.ones((2, 100), np.float32)
    masks[0, 50:] = 0.0
    out = wrapper(wav, masks=masks)
    assert out.shape == (2, CFG["lin_neurons"])
    assert np.isfinite(out).all()

    # manual compaction of item 0 == the wrapper's masked result
    keep = wav[0, 0, :8000]
    compacted = np.zeros((1, 1, S), np.float32)
    compacted[0, 0, :8000] = keep
    frame_total = wrapper.model.num_frames(S)
    frame_mask = (np.arange(frame_total)[None, :]
                  < 0.5 * frame_total).astype(np.float32)
    manual = np.asarray(wrapper.model.forward_with_frame_mask(
        compacted[:, 0, :], frame_mask))
    np.testing.assert_allclose(out[0], manual[0], rtol=1e-4, atol=1e-4)

    # all-silent masks -> NaN batch
    nan_out = wrapper(wav, masks=np.zeros((2, 100), np.float32))
    assert np.isnan(nan_out).all()

    # one too-short, one fine -> NaN only for the short one
    masks2 = np.ones((2, 100), np.float32)
    masks2[0, 1:] = 0.0      # ~160 samples < min_num_samples (640)
    mixed = wrapper(wav, masks=masks2)
    assert np.isnan(mixed[0]).all() and np.isfinite(mixed[1]).all()


def test_min_num_samples_analytic():
    model = _native_model()
    # largest reflect pad is dilation 4 * (3-1)//2 = 4 -> 5 frames -> 640
    assert model.min_num_samples == 640
    emb = model(np.zeros((1, 1, 640), np.float32)
                + 0.01 * np.random.default_rng(0)
                .standard_normal((1, 1, 640)).astype(np.float32))
    assert np.isfinite(np.asarray(emb)).all()


def test_speechbrain_fbank_padded_nfft_golden():
    """n_fft > win_length: torch.stft CENTERS the win_length window
    inside the n_fft frame (not right-aligned) — regression for the
    round-4 review finding."""
    from pyannote_audio_tpu.ops.fbank import speechbrain_fbank

    rng = np.random.default_rng(1)
    wav = rng.standard_normal((2, 8000)).astype(np.float32) * 0.1
    ours = np.asarray(speechbrain_fbank(wav, n_mels=24, n_fft=512))

    t = torch.from_numpy(wav)
    stft = torch.stft(t, n_fft=512, hop_length=160, win_length=400,
                      window=torch.hamming_window(400), center=True,
                      pad_mode="constant", normalized=False,
                      onesided=True, return_complex=True)
    power = (stft.real ** 2 + stft.imag ** 2).transpose(1, 2)

    def to_mel(hz):
        return 2595.0 * np.log10(1.0 + hz / 700.0)

    def to_hz(mel):
        return 700.0 * (10.0 ** (mel / 2595.0) - 1.0)

    hz = to_hz(np.linspace(to_mel(0.0), to_mel(8000.0), 24 + 2))
    band = (hz[1:] - hz[:-1])[:-1]
    f_central = hz[1:-1]
    all_freqs = np.linspace(0, 8000, 512 // 2 + 1)
    slope = (all_freqs[:, None] - f_central[None, :]) / band[None, :]
    banks = np.maximum(0.0, np.minimum(slope + 1, -slope + 1))
    mel = power @ torch.from_numpy(banks.astype(np.float32))
    x_db = 10.0 * torch.log10(mel.clamp(min=1e-10))
    floor = x_db.amax(dim=(-2, -1), keepdim=True) - 80.0
    theirs = torch.max(x_db, floor).numpy()
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=2e-3)

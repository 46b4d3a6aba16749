"""TitaNet golden parity: flax implementation vs a torch replica written
from NeMo's module semantics (nemo.collections.asr jasper.py +
speaker_modules.py), plus the `.nemo` archive conversion path.

The replica defines the EXACT state-dict key layout NeMo emits
(encoder.encoder.{i}.mconv.{j}..., decoder._pooling..., decoder
.emb_layers...), so the converter is exercised against real key shapes —
the round-3 DPRNN lesson: replicas are written from the REFERENCE
semantics, never from our module.
"""

import io
import tarfile

import numpy as np
import pytest
import torch
import torch.nn as tnn

from pyannote_audio_tpu.models.embedding.titanet import (
    TitaNet, _model_kwargs_from_config)
from pyannote_audio_tpu.ops.fbank import (_slaney_mel_banks,
                                          nemo_mel_spectrogram)

torch.manual_seed(0)

SMALL_BLOCKS = [
    dict(filters=16, repeat=1, kernel=3, residual=False, separable=True,
         se=True),
    dict(filters=16, repeat=2, kernel=7, residual=True, separable=True,
         se=True),
    dict(filters=24, repeat=1, kernel=1, residual=False, separable=False,
         se=True),
]


# ---------------------------------------------------------------- replica


class MaskedConv1d(tnn.Module):
    """NeMo MaskedConv1d: zero-fill beyond the valid frames BEFORE the
    conv (jasper.py), symmetric zero padding, stride 1."""

    def __init__(self, cin, cout, k, groups=1, dilation=1):
        super().__init__()
        self.conv = tnn.Conv1d(cin, cout, k,
                               padding=dilation * (k - 1) // 2,
                               groups=groups, dilation=dilation,
                               bias=False)

    def forward(self, x, mask):
        if mask is not None:
            x = x * mask
        return self.conv(x)


class SqueezeExcite(tnn.Module):
    """NeMo SqueezeExcite, global context (se_context_size=-1)."""

    def __init__(self, channels, reduction=8):
        super().__init__()
        self.fc = tnn.Sequential(
            tnn.Linear(channels, channels // reduction),
            tnn.ReLU(),
            tnn.Linear(channels // reduction, channels))

    def forward(self, x, mask):
        if mask is None:
            y = x.mean(dim=2)
        else:
            y = (x * mask).sum(dim=2) / mask.sum(dim=2)
        y = self.fc(y)
        return x * torch.sigmoid(y).unsqueeze(-1)


class JasperBlock(tnn.Module):
    """NeMo JasperBlock ordering: repeat x [conv(s) + BN (+ReLU between
    repeats)], SE at the END of mconv, residual conv+BN of the block
    input added before the final activation (self.mout)."""

    def __init__(self, cin, cfg):
        super().__init__()
        filters = cfg["filters"]
        repeat = cfg.get("repeat", 1)
        k = cfg["kernel"]
        mconv = []
        inp = cin
        for r in range(repeat):
            if cfg.get("separable"):
                mconv.append(MaskedConv1d(inp, inp, k, groups=inp))
                mconv.append(MaskedConv1d(inp, filters, 1))
            else:
                mconv.append(MaskedConv1d(inp, filters, k))
            mconv.append(tnn.BatchNorm1d(filters))
            if r != repeat - 1:
                mconv.append(tnn.ReLU())
                mconv.append(tnn.Dropout(0.0))
            inp = filters
        if cfg.get("se", True):
            mconv.append(SqueezeExcite(filters))
        self.mconv = tnn.ModuleList(mconv)
        if cfg.get("residual"):
            self.res = tnn.ModuleList([tnn.ModuleList(
                [MaskedConv1d(cin, filters, 1),
                 tnn.BatchNorm1d(filters)])])
        else:
            self.res = None
        self.mout = tnn.Sequential(tnn.ReLU(), tnn.Dropout(0.0))

    def forward(self, x, mask):
        out = x
        for layer in self.mconv:
            if isinstance(layer, (MaskedConv1d, SqueezeExcite)):
                out = layer(out, mask)
            else:
                out = layer(out)
        if self.res is not None:
            res = self.res[0][0](x, mask)
            res = self.res[0][1](res)
            out = out + res
        return self.mout(out)


class _Encoder(tnn.Module):
    def __init__(self, feat_in, blocks):
        super().__init__()
        mods, cin = [], feat_in
        for cfg in blocks:
            mods.append(JasperBlock(cin, cfg))
            cin = cfg["filters"]
        self.encoder = tnn.ModuleList(mods)

    def forward(self, x, mask):
        for block in self.encoder:
            x = block(x, mask)
        return x


class TDNNModule(tnn.Module):
    def __init__(self, cin, cout, k=1):
        super().__init__()
        self.conv_layer = tnn.Conv1d(cin, cout, k, padding=k // 2)
        self.activation = tnn.ReLU()
        self.bn = tnn.BatchNorm1d(cout)

    def forward(self, x):
        return self.bn(self.activation(self.conv_layer(x)))


class AttentivePoolLayer(tnn.Module):
    def __init__(self, channels, attention_channels, eps=1e-10):
        super().__init__()
        self.attention_layer = tnn.Sequential(
            TDNNModule(channels * 3, attention_channels),
            tnn.Tanh(),
            tnn.Conv1d(attention_channels, channels, 1))
        self.eps = eps

    def forward(self, x, mask):
        if mask is None:
            mask = torch.ones(x.shape[0], 1, x.shape[2])
        w = mask / mask.sum(dim=2, keepdim=True)
        mean = (x * w).sum(dim=2, keepdim=True)
        std = ((x - mean).pow(2) * w).sum(dim=2, keepdim=True) \
            .clamp(self.eps).sqrt()
        attn = torch.cat([x, mean.expand_as(x), std.expand_as(x)], dim=1)
        attn = self.attention_layer(attn)
        attn = attn.masked_fill(mask == 0, float("-inf")).softmax(dim=2)
        mu = (attn * x).sum(dim=2)
        sg = ((attn * (x - mu.unsqueeze(2)).pow(2)).sum(dim=2)) \
            .clamp(self.eps).sqrt()
        return torch.cat([mu, sg], dim=1)


class _Decoder(tnn.Module):
    def __init__(self, feat_in, emb_dim, attention_channels,
                 num_classes=7):
        super().__init__()
        self._pooling = AttentivePoolLayer(feat_in, attention_channels)
        self.emb_layers = tnn.ModuleList([tnn.Sequential(
            tnn.BatchNorm1d(feat_in * 2),
            tnn.Conv1d(feat_in * 2, emb_dim, 1))])
        self.final = tnn.Linear(emb_dim, num_classes, bias=False)

    def forward(self, x, mask):
        pool = self._pooling(x, mask).unsqueeze(-1)
        emb = self.emb_layers[0](pool)
        return emb.squeeze(-1)


class TitaNetReplica(tnn.Module):
    def __init__(self, n_mels, blocks, emb_dim, attention_channels):
        super().__init__()
        self.encoder = _Encoder(n_mels, blocks)
        self.decoder = _Decoder(blocks[-1]["filters"], emb_dim,
                                attention_channels)

    def forward(self, feats, mask=None):
        # feats (B, n_mels, T), mask (B, 1, T) or None
        return self.decoder(self.encoder(feats, mask), mask)


def _randomize_bn_stats(module, rng):
    for m in module.modules():
        if isinstance(m, tnn.BatchNorm1d):
            m.running_mean.copy_(torch.from_numpy(
                rng.normal(0, 0.3, m.running_mean.shape)
                .astype(np.float32)))
            m.running_var.copy_(torch.from_numpy(
                rng.uniform(0.5, 1.5, m.running_var.shape)
                .astype(np.float32)))


def _build_pair(blocks=SMALL_BLOCKS, n_mels=12, emb_dim=16, att=8):
    replica = TitaNetReplica(n_mels, blocks, emb_dim, att).eval()
    with torch.no_grad():
        _randomize_bn_stats(replica, np.random.default_rng(7))
    state = {k: v.detach().numpy()
             for k, v in replica.state_dict().items()}
    model = TitaNet(n_mels=n_mels, blocks=blocks, emb_dim=emb_dim,
                    attention_channels=att)
    model.build()
    model.params = model.convert_nemo_state_dict(state)
    return replica, model


# ------------------------------------------------------------------ tests


def test_nemo_mel_matches_torch_stft():
    """Our centered reflect-pad STFT + Slaney mel + per-feature
    normalization reproduces the torch.stft-based NeMo featurizer."""
    rng = np.random.default_rng(0)
    wav = rng.standard_normal((2, 8000)).astype(np.float32) * 0.3
    n_fft, hop, win, n_mels = 512, 160, 400, 24

    x = torch.from_numpy(wav)
    x = torch.cat((x[:, :1], x[:, 1:] - 0.97 * x[:, :-1]), dim=1)
    # NeMo builds its window with periodic=False (symmetric hann):
    # nemo FilterbankFeatures: window_fn(self.win_length, periodic=False)
    spec = torch.stft(x, n_fft=n_fft, hop_length=hop, win_length=win,
                      window=torch.hann_window(win, periodic=False),
                      center=True, pad_mode="reflect",
                      return_complex=True)
    power = spec.abs().pow(2.0)                       # (B, F, T)
    banks = torch.from_numpy(
        _slaney_mel_banks(n_mels, n_fft, 16000, 0.0, 8000.0))
    mel = torch.einsum("bft,fm->bmt", power, banks)
    feats = torch.log(mel + 2.0 ** -24)
    mean = feats.mean(dim=2, keepdim=True)
    std = feats.std(dim=2, unbiased=True, keepdim=True)
    expected = ((feats - mean) / (std + 1e-5)).transpose(1, 2).numpy()

    ours = np.asarray(nemo_mel_spectrogram(wav, n_mels=n_mels))
    assert ours.shape == expected.shape == (2, 1 + 8000 // hop, n_mels)
    np.testing.assert_allclose(ours, expected, atol=2e-4)


def test_titanet_golden_full_length():
    replica, model = _build_pair()
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((3, 40, 12)).astype(np.float32)
    with torch.no_grad():
        expected = replica(
            torch.from_numpy(feats.transpose(0, 2, 1))).numpy()
    got = np.asarray(model.module.apply(
        model.params, np.asarray(feats)))
    np.testing.assert_allclose(got, expected, atol=1e-4)


def test_titanet_golden_masked():
    replica, model = _build_pair()
    rng = np.random.default_rng(2)
    feats = rng.standard_normal((2, 50, 12)).astype(np.float32)
    mask = np.ones((2, 50), np.float32)
    mask[0, 30:] = 0.0
    mask[1, 10:20] = 0.0                      # interior hole
    with torch.no_grad():
        expected = replica(
            torch.from_numpy(feats.transpose(0, 2, 1)),
            torch.from_numpy(mask[:, None, :])).numpy()
    got = np.asarray(model.module.apply(
        model.params, np.asarray(feats), mask=np.asarray(mask)))
    np.testing.assert_allclose(got, expected, atol=1e-4)


def _nemo_tar_bytes(replica, n_mels, blocks, emb_dim, att) -> bytes:
    """Pack the replica as a real .nemo archive (tar with
    model_config.yaml + model_weights.ckpt)."""
    import yaml

    config = {
        "preprocessor": {"sample_rate": 16000, "features": n_mels,
                         "n_fft": 512, "window_size": 0.025,
                         "window_stride": 0.01,
                         "normalize": "per_feature", "window": "hann"},
        "encoder": {"feat_in": n_mels, "jasper": [
            {"filters": b["filters"], "repeat": b.get("repeat", 1),
             "kernel": [b["kernel"]], "stride": [1], "dilation": [1],
             "residual": b.get("residual", False),
             "separable": b.get("separable", False),
             "se": b.get("se", True), "se_context_size": -1}
            for b in blocks]},
        "decoder": {"feat_in": blocks[-1]["filters"], "num_classes": 7,
                    "pool_mode": "attention", "emb_sizes": emb_dim,
                    "attention_channels": att, "angular": True},
    }
    weights = io.BytesIO()
    torch.save(replica.state_dict(), weights)
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as tar:
        for name, payload in [
                ("./model_config.yaml",
                 yaml.safe_dump(config).encode()),
                ("./model_weights.ckpt", weights.getvalue())]:
            info = tarfile.TarInfo(name)
            info.size = len(payload)
            tar.addfile(info, io.BytesIO(payload))
    return buf.getvalue()


def test_from_nemo_tar_end_to_end(tmp_path):
    """A synthetic .nemo archive loads through from_nemo (config-driven
    block layout) and reproduces the torch replica on raw audio through
    the full mel front-end."""
    n_mels, emb_dim, att = 12, 16, 8
    replica = TitaNetReplica(n_mels, SMALL_BLOCKS, emb_dim, att).eval()
    with torch.no_grad():
        _randomize_bn_stats(replica, np.random.default_rng(9))
    nemo_path = tmp_path / "titanet_small.nemo"
    nemo_path.write_bytes(
        _nemo_tar_bytes(replica, n_mels, SMALL_BLOCKS, emb_dim, att))

    model = TitaNet.from_nemo(nemo_path)
    assert model.dimension == emb_dim
    assert [b["filters"] for b in model.blocks] == [16, 16, 24]

    rng = np.random.default_rng(3)
    wav = (rng.standard_normal((2, 1, 16000)) * 0.2).astype(np.float32)
    got = np.asarray(model(wav))

    feats = np.asarray(nemo_mel_spectrogram(wav[:, 0, :],
                                            n_mels=n_mels))
    with torch.no_grad():
        expected = replica(
            torch.from_numpy(feats.transpose(0, 2, 1))).numpy()
    np.testing.assert_allclose(got, expected, atol=1e-4)


def test_model_kwargs_from_config_defaults():
    kwargs = _model_kwargs_from_config({
        "preprocessor": {"features": 80, "sample_rate": 16000},
        "encoder": {"jasper": [
            {"filters": 1024, "repeat": 1, "kernel": [3],
             "separable": True, "se": True}]},
        "decoder": {"emb_sizes": [192], "attention_channels": 128},
    })
    assert kwargs["n_mels"] == 80
    assert kwargs["emb_dim"] == 192
    assert kwargs["blocks"][0]["kernel"] == 3


def test_titanet_num_frames_and_min_samples():
    model = TitaNet(n_mels=12, blocks=SMALL_BLOCKS, emb_dim=16,
                    attention_channels=8)
    assert model.num_frames(16000) == 101
    # 4x win_length floor (~reference NeMo wrapper's bisected boundary):
    # shorter compacted rows NaN out instead of embedding 1-2 mel frames
    assert model.min_num_samples == 4 * model.win_length
    assert model.dimension == 16


def test_strided_nemo_config_is_refused():
    """Conv weight shapes don't encode stride, so a strided
    ConvASREncoder .nemo would convert cleanly and silently run at the
    wrong frame rate — both the direct constructor AND the
    from-config path must refuse loudly."""
    import pytest
    blocks = [dict(filters=32, repeat=1, kernel=3, dilation=1,
                   stride=2, residual=False, separable=True, se=False)]
    with pytest.raises(ValueError, match="stride"):
        TitaNet(n_mels=12, blocks=blocks, emb_dim=16,
                attention_channels=8)
    kwargs = _model_kwargs_from_config({
        "preprocessor": {"features": 80, "sample_rate": 16000},
        "encoder": {"jasper": [
            {"filters": 1024, "repeat": 1, "kernel": [3], "stride": [2],
             "separable": True, "se": True}]},
        "decoder": {"emb_sizes": [192], "attention_channels": 128},
    })
    with pytest.raises(ValueError, match="stride"):
        TitaNet(**kwargs)


def test_nemo_wrapper_end_to_end(tmp_path):
    """PretrainedSpeakerEmbedding dispatches a local .nemo archive to
    the native NeMo wrapper; the masked/compacted path mirrors the
    reference semantics (NaN for too-short rows)."""
    from pyannote_audio_tpu.pipelines.speaker_verification import (
        NeMoPretrainedSpeakerEmbedding, PretrainedSpeakerEmbedding)

    n_mels, emb_dim, att = 12, 16, 8
    replica = TitaNetReplica(n_mels, SMALL_BLOCKS, emb_dim, att).eval()
    nemo_path = tmp_path / "tiny.nemo"
    nemo_path.write_bytes(
        _nemo_tar_bytes(replica, n_mels, SMALL_BLOCKS, emb_dim, att))

    backend = PretrainedSpeakerEmbedding(str(nemo_path))
    assert isinstance(backend, NeMoPretrainedSpeakerEmbedding)
    assert backend.dimension == emb_dim
    assert backend.metric == "cosine"

    rng = np.random.default_rng(4)
    wav = (rng.standard_normal((3, 1, 16000)) * 0.2).astype(np.float32)
    full = backend(wav)
    assert full.shape == (3, emb_dim) and np.isfinite(full).all()

    masks = np.ones((3, 100), np.float32)
    masks[1, 40:] = 0.0              # half speech
    masks[2, :] = 0.0                # all masked -> too short -> NaN
    masked = backend(wav, masks=masks)
    assert masked.shape == (3, emb_dim)
    assert np.isfinite(masked[0]).all() and np.isfinite(masked[1]).all()
    assert np.isnan(masked[2]).all()
    # the fully-unmasked row reproduces the unmasked embedding
    np.testing.assert_allclose(masked[0], full[0], atol=1e-4)

    # extracted-directory form loads too
    ext = tmp_path / "extracted"
    with tarfile.open(nemo_path) as tar:
        tar.extractall(ext)
    backend2 = PretrainedSpeakerEmbedding(str(ext))
    assert isinstance(backend2, NeMoPretrainedSpeakerEmbedding)
    np.testing.assert_allclose(backend2(wav), full, atol=1e-5)


def test_export_nemo_state_dict_roundtrip():
    """Flax -> NeMo state dict loads into the torch replica with
    strict=True (exact key layout) and reproduces the flax outputs."""
    from pyannote_audio_tpu.models.embedding.titanet import \
        export_nemo_state_dict

    replica0, model = _build_pair()
    state = export_nemo_state_dict(model)
    fresh = TitaNetReplica(12, SMALL_BLOCKS, 16, 8).eval()
    missing, unexpected = fresh.load_state_dict(
        {k: torch.from_numpy(np.array(v, copy=True))
         for k, v in state.items()}, strict=True)
    assert not missing and not unexpected

    rng = np.random.default_rng(5)
    feats = rng.standard_normal((2, 30, 12)).astype(np.float32)
    with torch.no_grad():
        expected = fresh(torch.from_numpy(
            feats.transpose(0, 2, 1))).numpy()
    got = np.asarray(model.module.apply(model.params, np.asarray(feats)))
    np.testing.assert_allclose(got, expected, atol=1e-4)


def test_export_nemo_checkpoint_roundtrip(tmp_path):
    """export_nemo_checkpoint writes a .nemo archive that from_nemo
    loads back to identical embeddings (two-way conversion)."""
    from pyannote_audio_tpu.models.embedding.titanet import (
        TitaNet, export_nemo_checkpoint)

    _, model = _build_pair()
    path = export_nemo_checkpoint(model, tmp_path / "out")
    assert path.name == "model.nemo"
    reloaded = TitaNet.from_nemo(path)
    rng = np.random.default_rng(6)
    wav = (rng.standard_normal((2, 1, 16000)) * 0.2).astype(np.float32)
    np.testing.assert_allclose(np.asarray(model(wav)),
                               np.asarray(reloaded(wav)), atol=1e-5)


def test_config_stft_geometry_honored():
    """A .nemo config with non-default STFT geometry must drive the
    front-end (round-4 review finding: silently-wrong hop)."""
    kwargs = _model_kwargs_from_config({
        "preprocessor": {"features": 80, "sample_rate": 16000,
                         "window_size": 0.025, "window_stride": 0.02,
                         "n_fft": 512},
        "encoder": {"jasper": []},
        "decoder": {"emb_sizes": 192},
    })
    assert kwargs["hop_length"] == 320
    model = TitaNet(n_mels=12, blocks=SMALL_BLOCKS, emb_dim=16,
                    attention_channels=8, **{
                        k: kwargs[k]
                        for k in ("n_fft", "win_length", "hop_length")})
    assert model.num_frames(16000) == 51           # 1 + 16000 // 320
    assert model.min_num_samples == 4 * 400        # 4x win_length floor

    # an n_fft omitted from the config falls back to next-pow2(win)
    kwargs = _model_kwargs_from_config({
        "preprocessor": {"window_size": 0.025, "window_stride": 0.01},
        "encoder": {}, "decoder": {}})
    assert kwargs["n_fft"] == 512

    # unsupported window types fail loudly instead of converting wrong
    with pytest.raises(ValueError, match="window"):
        _model_kwargs_from_config({
            "preprocessor": {"window": "hamming"},
            "encoder": {}, "decoder": {}})

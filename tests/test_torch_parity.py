"""Golden parity vs torch replicas of the reference architectures.

Builds the architectures with *standard torch layers* (torch.nn only,
state-dict keys named as the reference checkpoints name them), converts
the weights with our converters, and checks our jax forward against the
torch forward. This is the strongest offline guarantee that real
reference checkpoints will produce the same scores (SURVEY.md §7.2 item 1).
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp


def _sinc_weights_np(n_filters=80, kernel_size=251):
    """Fixed sinc filterbank weights shared by both sides."""
    from pyannote_audio_tpu.models.blocks.sincnet import (
        mel_initialized_bands, sinc_filters)
    low, band = mel_initialized_bands(n_filters, 16000, 50.0, 50.0)
    k = np.asarray(sinc_filters(jnp.asarray(low), jnp.asarray(band),
                                kernel_size, 16000))  # (K, F)
    return low, band, k


class TorchPyanNet(tnn.Module):
    """Reference-shaped PyanNet with a fixed (precomputed) sinc conv."""

    def __init__(self, sinc_kernel: np.ndarray, dimension: int = 7):
        super().__init__()
        self.wav_norm = tnn.InstanceNorm1d(1, affine=True)
        self.register_buffer(
            "sinc", torch.from_numpy(sinc_kernel.T[:, None, :].copy()))
        self.norm80 = tnn.InstanceNorm1d(80, affine=True)
        self.conv1 = tnn.Conv1d(80, 60, 5)
        self.norm60a = tnn.InstanceNorm1d(60, affine=True)
        self.conv2 = tnn.Conv1d(60, 60, 5)
        self.norm60b = tnn.InstanceNorm1d(60, affine=True)
        self.lstm = tnn.LSTM(60, 128, num_layers=2, batch_first=True,
                             bidirectional=True)
        self.lin1 = tnn.Linear(256, 128)
        self.lin2 = tnn.Linear(128, 128)
        self.classifier = tnn.Linear(128, dimension)

    def forward(self, wav):
        x = self.wav_norm(wav)
        x = F.conv1d(x, self.sinc, stride=10)
        x = torch.abs(x)
        x = F.leaky_relu(self.norm80(F.max_pool1d(x, 3, 3)))
        x = self.conv1(x)
        x = F.leaky_relu(self.norm60a(F.max_pool1d(x, 3, 3)))
        x = self.conv2(x)
        x = F.leaky_relu(self.norm60b(F.max_pool1d(x, 3, 3)))
        x, _ = self.lstm(x.transpose(1, 2))
        x = F.leaky_relu(self.lin1(x))
        x = F.leaky_relu(self.lin2(x))
        return F.log_softmax(self.classifier(x), dim=-1)

    def reference_state_dict(self, low, band):
        """Keys named as the reference checkpoint names them."""
        sd = {
            "sincnet.wav_norm1d.weight": self.wav_norm.weight,
            "sincnet.wav_norm1d.bias": self.wav_norm.bias,
            "sincnet.conv1d.0.filterbank.low_hz_":
                torch.from_numpy(low[:, None].copy()),
            "sincnet.conv1d.0.filterbank.band_hz_":
                torch.from_numpy(band[:, None].copy()),
            "sincnet.norm1d.0.weight": self.norm80.weight,
            "sincnet.norm1d.0.bias": self.norm80.bias,
            "sincnet.conv1d.1.weight": self.conv1.weight,
            "sincnet.conv1d.1.bias": self.conv1.bias,
            "sincnet.norm1d.1.weight": self.norm60a.weight,
            "sincnet.norm1d.1.bias": self.norm60a.bias,
            "sincnet.conv1d.2.weight": self.conv2.weight,
            "sincnet.conv1d.2.bias": self.conv2.bias,
            "sincnet.norm1d.2.weight": self.norm60b.weight,
            "sincnet.norm1d.2.bias": self.norm60b.bias,
            "linear.0.weight": self.lin1.weight,
            "linear.0.bias": self.lin1.bias,
            "linear.1.weight": self.lin2.weight,
            "linear.1.bias": self.lin2.bias,
            "classifier.weight": self.classifier.weight,
            "classifier.bias": self.classifier.bias,
        }
        for i in range(2):
            for kind in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
                for suffix in ("", "_reverse"):
                    sd[f"lstm.{kind}_l{i}{suffix}"] = getattr(
                        self.lstm, f"{kind}_l{i}{suffix}")
        return {k: v.detach().numpy() for k, v in sd.items()}


def test_pyannet_matches_torch_replica():
    from pyannote_audio_tpu.core.model import (Problem, Resolution,
                                               Specifications)
    from pyannote_audio_tpu.models.segmentation.pyannet import PyanNet

    torch.manual_seed(0)
    low, band, sinc_kernel = _sinc_weights_np()
    ref = TorchPyanNet(sinc_kernel)
    # non-trivial affine norms
    with torch.no_grad():
        for norm in (ref.wav_norm, ref.norm80, ref.norm60a, ref.norm60b):
            norm.weight.uniform_(0.5, 1.5)
            norm.bias.uniform_(-0.2, 0.2)
    ref.eval()

    wav = torch.randn(2, 1, 32000) * 0.1
    with torch.no_grad():
        expected = ref(wav).numpy()

    model = PyanNet()
    model.specifications = Specifications(
        problem=Problem.MONO_LABEL_CLASSIFICATION,
        resolution=Resolution.FRAME, duration=2.0,
        classes=["a", "b", "c"], powerset_max_classes=2)
    model.build()
    model.params = jax.tree_util.tree_map(
        jnp.asarray,
        model.convert_torch_state_dict(ref.reference_state_dict(low, band)))
    model._jitted_apply = None
    ours = np.asarray(model(jnp.asarray(wav.numpy())))

    assert ours.shape == expected.shape
    np.testing.assert_allclose(ours, expected, atol=2e-4)


class TorchBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride=stride, padding=1,
                                bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.shortcut = tnn.Sequential()
        if stride != 1 or cin != cout:
            self.shortcut = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(cout))

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return F.relu(out + self.shortcut(x))


class TorchResNet34Trunk(tnn.Module):
    def __init__(self, m=32):
        super().__init__()
        self.conv1 = tnn.Conv2d(1, m, 3, padding=1, bias=False)
        self.bn1 = tnn.BatchNorm2d(m)
        layers = []
        cin = m
        for mult, n, stride in ((1, 3, 1), (2, 4, 2), (4, 6, 2),
                                (8, 3, 2)):
            blocks = []
            for i in range(n):
                blocks.append(TorchBasicBlock(
                    cin, m * mult, stride=stride if i == 0 else 1))
                cin = m * mult
            layers.append(tnn.Sequential(*blocks))
        self.layer1, self.layer2, self.layer3, self.layer4 = layers

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
            x = layer(x)
        return x


def test_wespeaker_trunk_matches_torch_replica():
    from pyannote_audio_tpu.models.embedding.wespeaker import \
        WeSpeakerResNet34

    torch.manual_seed(1)
    trunk = TorchResNet34Trunk()
    # randomize batch-norm running stats so they actually matter
    with torch.no_grad():
        for mod in trunk.modules():
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.uniform_(-0.3, 0.3)
                mod.running_var.uniform_(0.5, 1.5)
                mod.weight.uniform_(0.5, 1.5)
                mod.bias.uniform_(-0.2, 0.2)
    trunk.eval()

    feats = torch.randn(2, 98, 80)  # (B, T, F) fbank-like features
    with torch.no_grad():
        # reference layout: (B, 1, F, T)
        out = trunk(feats.permute(0, 2, 1).unsqueeze(1))
        # flatten like TSTP: (c, f) -> c*F + f over (B, C, F', T')
        B, C, Fr, T = out.shape
        expected = out.reshape(B, C * Fr, T).transpose(1, 2).numpy()

    state = {f"resnet.{k}": v.detach().numpy()
             for k, v in trunk.state_dict().items()
             if "num_batches" not in k}
    state["resnet.seg_1.weight"] = np.zeros((256, 5120), np.float32)
    state["resnet.seg_1.bias"] = np.zeros(256, np.float32)

    model = WeSpeakerResNet34()
    model.build()
    model.params = jax.tree_util.tree_map(
        jnp.asarray, model.convert_torch_state_dict(state))

    # drive only the trunk (bypass fbank) in f32: this validates the
    # weight conversion exactly; production bf16 noise is a separate,
    # DER-level concern
    from pyannote_audio_tpu.models.embedding.wespeaker import ResNetTrunk
    x = jnp.asarray(feats.numpy())[..., None]  # (B, T, F, 1)
    trunk_f32 = ResNetTrunk(dtype=jnp.float32)
    variables = {"params": model.params["params"]["trunk"],
                 "batch_stats": model.params["batch_stats"]["trunk"]}
    h = trunk_f32.apply(variables, x)
    B, T, Fr, C = h.shape
    ours = np.asarray(jnp.swapaxes(h, 2, 3).reshape(B, T, C * Fr))
    assert ours.shape == expected.shape
    np.testing.assert_allclose(ours, expected, atol=2e-3)


class TorchTDNNXVector(tnn.Module):
    """Reference-shaped XVector TDNN + StatsPool + embedding (the part
    shared by XVectorMFCC and XVectorSincNet, reference xvector.py:63-89),
    fed with front-end features."""

    def __init__(self, in_channel, dimension=512):
        super().__init__()
        self.tdnns = tnn.ModuleList()
        for out_channel, k, d in zip((512, 512, 512, 512, 1500),
                                     (5, 3, 3, 1, 1), (1, 2, 3, 1, 1)):
            self.tdnns.extend([
                tnn.Conv1d(in_channel, out_channel, k, dilation=d),
                tnn.LeakyReLU(),
                tnn.BatchNorm1d(out_channel)])
            in_channel = out_channel
        self.embedding = tnn.Linear(in_channel * 2, dimension)

    def randomize_norms(self):
        with torch.no_grad():
            for mod in self.modules():
                if isinstance(mod, tnn.BatchNorm1d):
                    mod.running_mean.uniform_(-0.3, 0.3)
                    mod.running_var.uniform_(0.5, 1.5)
                    mod.weight.uniform_(0.5, 1.5)
                    mod.bias.uniform_(-0.2, 0.2)

    def forward(self, feats):                   # (B, C, T)
        x = feats
        for block in self.tdnns:
            x = block(x)
        stats = torch.cat([x.mean(dim=-1), x.std(dim=-1, unbiased=True)],
                          dim=1)
        return self.embedding(stats)

    def reference_state_dict(self):
        sd = {}
        for name, value in self.state_dict().items():
            if "num_batches" in name:
                continue
            sd[name] = value.detach().numpy()
        return sd


def _torch_mfcc(wav: torch.Tensor, n_mfcc=40, n_mels=128, n_fft=400,
                hop=200, sr=16000) -> torch.Tensor:
    """torchaudio transforms.MFCC defaults, implemented with plain torch
    ops (torchaudio is not in the env): centered reflect-pad spectrogram,
    hann periodic window, power 2, HTK-mel fbanks (norm=None),
    amplitude_to_DB(top_db=80), DCT-II ortho. (B, 1, S) -> (B, n_mfcc, T)."""
    x = wav[:, 0]
    pad = n_fft // 2
    xp = F.pad(x[:, None], (pad, pad), mode="reflect")[:, 0]
    frames = xp.unfold(-1, n_fft, hop)              # (B, T, n_fft)
    window = torch.hann_window(n_fft, periodic=True, dtype=torch.float64)
    spec = torch.fft.rfft(frames.double() * window, dim=-1).abs() ** 2

    def hz2mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=float) / 700.0)

    all_freqs = np.linspace(0, sr // 2, n_fft // 2 + 1)
    m_pts = np.linspace(hz2mel(0.0), hz2mel(sr / 2), n_mels + 2)
    f_pts = 700.0 * (10.0 ** (m_pts / 2595.0) - 1.0)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts[None, :] - all_freqs[:, None]
    fb = np.maximum(0.0, np.minimum(-slopes[:, :-2] / f_diff[:-1],
                                    slopes[:, 2:] / f_diff[1:]))
    mel = spec @ torch.from_numpy(fb)               # (B, T, n_mels)
    db = 10.0 * torch.log10(torch.clamp(mel, min=1e-10))
    db = torch.maximum(db, db.amax(dim=(-2, -1), keepdim=True) - 80.0)
    n = np.arange(n_mels)
    k = np.arange(n_mfcc)
    dct = np.cos(np.pi / n_mels * (n[:, None] + 0.5) * k[None, :]) \
        * np.sqrt(2.0 / n_mels)
    dct[:, 0] *= 1.0 / np.sqrt(2.0)
    mfcc = db @ torch.from_numpy(dct)               # (B, T, n_mfcc)
    return mfcc.transpose(1, 2).float()


def test_xvector_mfcc_matches_torch_replica():
    from pyannote_audio_tpu.models.embedding.xvector import XVectorMFCC

    torch.manual_seed(2)
    replica = TorchTDNNXVector(in_channel=40)
    replica.randomize_norms()
    replica.eval()

    wav = torch.randn(2, 1, 32000) * 0.1
    with torch.no_grad():
        expected = replica(_torch_mfcc(wav)).numpy()

    model = XVectorMFCC()
    model.build()
    model.params = jax.tree_util.tree_map(
        jnp.asarray,
        model.convert_torch_state_dict(replica.reference_state_dict()))
    model._jitted_apply = None
    ours = np.asarray(model(jnp.asarray(wav.numpy())))
    assert ours.shape == expected.shape
    np.testing.assert_allclose(ours, expected, atol=5e-3)
    # frame math agrees with the replica front-end: 161 MFCC frames
    # (center=True, hop 200) minus the valid convs k5, k3 d2, k3 d3
    feats = _torch_mfcc(wav)
    assert model.num_frames(32000) == feats.shape[-1] - 4 - 4 - 6


def test_xvector_sincnet_matches_torch_replica():
    from pyannote_audio_tpu.models.embedding.xvector import XVectorSincNet

    torch.manual_seed(3)
    low, band, sinc_kernel = _sinc_weights_np()

    class TorchXVectorSincNet(tnn.Module):
        def __init__(self):
            super().__init__()
            self.wav_norm = tnn.InstanceNorm1d(1, affine=True)
            self.register_buffer(
                "sinc", torch.from_numpy(sinc_kernel.T[:, None, :].copy()))
            self.norm80 = tnn.InstanceNorm1d(80, affine=True)
            self.conv1 = tnn.Conv1d(80, 60, 5)
            self.norm60a = tnn.InstanceNorm1d(60, affine=True)
            self.conv2 = tnn.Conv1d(60, 60, 5)
            self.norm60b = tnn.InstanceNorm1d(60, affine=True)
            self.xvector = TorchTDNNXVector(in_channel=60)

        def forward(self, wav):
            x = self.wav_norm(wav)
            x = F.conv1d(x, self.sinc, stride=10)
            x = torch.abs(x)
            x = F.leaky_relu(self.norm80(F.max_pool1d(x, 3, 3)))
            x = self.conv1(x)
            x = F.leaky_relu(self.norm60a(F.max_pool1d(x, 3, 3)))
            x = self.conv2(x)
            x = F.leaky_relu(self.norm60b(F.max_pool1d(x, 3, 3)))
            return self.xvector(x)

    ref = TorchXVectorSincNet()
    ref.xvector.randomize_norms()
    with torch.no_grad():
        for norm in (ref.wav_norm, ref.norm80, ref.norm60a, ref.norm60b):
            norm.weight.uniform_(0.5, 1.5)
            norm.bias.uniform_(-0.2, 0.2)
    ref.eval()

    wav = torch.randn(2, 1, 32000) * 0.1
    with torch.no_grad():
        expected = ref(wav).numpy()

    state = {
        "sincnet.wav_norm1d.weight": ref.wav_norm.weight,
        "sincnet.wav_norm1d.bias": ref.wav_norm.bias,
        "sincnet.conv1d.0.filterbank.low_hz_":
            torch.from_numpy(low[:, None].copy()),
        "sincnet.conv1d.0.filterbank.band_hz_":
            torch.from_numpy(band[:, None].copy()),
        "sincnet.norm1d.0.weight": ref.norm80.weight,
        "sincnet.norm1d.0.bias": ref.norm80.bias,
        "sincnet.conv1d.1.weight": ref.conv1.weight,
        "sincnet.conv1d.1.bias": ref.conv1.bias,
        "sincnet.norm1d.1.weight": ref.norm60a.weight,
        "sincnet.norm1d.1.bias": ref.norm60a.bias,
        "sincnet.conv1d.2.weight": ref.conv2.weight,
        "sincnet.conv1d.2.bias": ref.conv2.bias,
        "sincnet.norm1d.2.weight": ref.norm60b.weight,
        "sincnet.norm1d.2.bias": ref.norm60b.bias,
    }
    state = {k: v.detach().numpy() for k, v in state.items()}
    state.update(ref.xvector.reference_state_dict())

    model = XVectorSincNet()
    model.build()
    model.params = jax.tree_util.tree_map(
        jnp.asarray, model.convert_torch_state_dict(state))
    model._jitted_apply = None
    ours = np.asarray(model(jnp.asarray(wav.numpy())))
    assert ours.shape == expected.shape
    np.testing.assert_allclose(ours, expected, atol=5e-3)


# ----------------------------------------------------------- SSL encoders

def _ssl_golden(hf_model, our_cfg, layers, atol):
    """Drive a real HF transformer (ground truth for the reference's SSL
    trunks) and our converted SSLEncoder on the same waveform."""
    from pyannote_audio_tpu.models.blocks.ssl import (SSLEncoder,
                                                      convert_torch_wav2vec2)
    hf_model.eval()
    wav = torch.randn(2, 6400) * 0.1
    with torch.no_grad():
        expected = hf_model(wav).last_hidden_state.numpy()
    state = {k: v.detach().numpy() for k, v in
             hf_model.state_dict().items()}
    trunk = convert_torch_wav2vec2(state, layers=layers)
    enc = SSLEncoder(**our_cfg)
    variables = {"params": jax.tree_util.tree_map(jnp.asarray, trunk)}
    states = enc.apply(variables, jnp.asarray(wav.numpy()))
    ours = np.asarray(states[-1])
    assert ours.shape == expected.shape
    np.testing.assert_allclose(ours, expected, atol=atol)


_TINY = dict(hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
             intermediate_size=128, conv_dim=(32,) * 7,
             conv_kernel=(10, 3, 3, 3, 3, 2, 2),
             conv_stride=(5, 2, 2, 2, 2, 2, 2),
             hidden_dropout=0.0, attention_dropout=0.0,
             feat_proj_dropout=0.0, layerdrop=0.0)


@pytest.mark.slow
def test_ssl_wavlm_base_matches_hf():
    """WavLM post-norm + group-norm trunk + per-layer gated rel-pos bias
    (the reference's default SSeRiouSS trunk, SSeRiouSS.py:96-128)."""
    from transformers import WavLMConfig, WavLMModel
    torch.manual_seed(5)
    config = WavLMConfig(do_stable_layer_norm=False,
                         feat_extract_norm="group", **_TINY)
    hf = WavLMModel(config)
    _ssl_golden(hf, dict(hidden=64, layers=2, heads=4, ffn=128,
                         conv_channels=32, rel_pos_bias=True,
                         pre_ln=False, conv_norm_mode="group"),
                layers=2, atol=2e-4)


def test_ssl_wavlm_large_style_matches_hf():
    """WavLM pre-norm (stable layer norm) + layer-norm conv trunk."""
    from transformers import WavLMConfig, WavLMModel
    torch.manual_seed(6)
    config = WavLMConfig(do_stable_layer_norm=True,
                         feat_extract_norm="layer", conv_bias=True,
                         **_TINY)
    hf = WavLMModel(config)
    _ssl_golden(hf, dict(hidden=64, layers=2, heads=4, ffn=128,
                         conv_channels=32, rel_pos_bias=True,
                         pre_ln=True, conv_norm_mode="layer"),
                layers=2, atol=2e-4)


def test_ssl_wav2vec2_base_matches_hf():
    """wav2vec2 post-norm + group-norm trunk, no position bias."""
    from transformers import Wav2Vec2Config, Wav2Vec2Model
    torch.manual_seed(7)
    config = Wav2Vec2Config(do_stable_layer_norm=False,
                            feat_extract_norm="group", **_TINY)
    hf = Wav2Vec2Model(config)
    _ssl_golden(hf, dict(hidden=64, layers=2, heads=4, ffn=128,
                         conv_channels=32, rel_pos_bias=False,
                         pre_ln=False, conv_norm_mode="group"),
                layers=2, atol=2e-4)


def test_sseriouss_full_checkpoint_matches_torch():
    """Full reference-shaped SSeRiouSS state dict (torchaudio key layout
    + wav2vec_weights + LSTM/linear/classifier head) loads through
    convert_torch_state_dict and matches the torch composition:
    uniform-softmax average of the num_layers transformer outputs
    (reference SSeRiouSS.py:125-128, extract_features semantics)."""
    from transformers import Wav2Vec2Config, Wav2Vec2Model

    from pyannote_audio_tpu.core.model import (Problem, Resolution,
                                               Specifications)
    from pyannote_audio_tpu.models.segmentation.sseriouss import SSeRiouSS

    torch.manual_seed(8)
    hf = Wav2Vec2Model(Wav2Vec2Config(do_stable_layer_norm=False,
                                      feat_extract_norm="group", **_TINY))
    hf.eval()
    lstm = tnn.LSTM(64, 16, num_layers=2, batch_first=True,
                    bidirectional=True)
    lin0, lin1 = tnn.Linear(32, 24), tnn.Linear(24, 24)
    classifier = tnn.Linear(24, 7)

    wav = torch.randn(2, 1, 16000) * 0.1
    with torch.no_grad():
        hs = hf(wav[:, 0], output_hidden_states=True).hidden_states
        x = torch.stack(hs[1:], dim=-1).mean(-1)   # softmax(ones) = mean
        x, _ = lstm(x)
        x = F.leaky_relu(lin0(x))
        x = F.leaky_relu(lin1(x))
        expected = F.log_softmax(classifier(x), dim=-1).numpy()

    # rename the HF trunk to the torchaudio layout the reference saves
    state = {}
    for k, v in hf.state_dict().items():
        if k.startswith("encoder."):
            k = "encoder.transformer." + k[len("encoder."):]
        if k.startswith("feature_projection."):
            k = "encoder." + k
        state[f"wav2vec.{k}"] = v.detach().numpy()
    state["wav2vec_weights"] = np.ones(2, np.float32)
    for kind in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
        for i in range(2):
            for sfx in ("", "_reverse"):
                state[f"lstm.{kind}_l{i}{sfx}"] = getattr(
                    lstm, f"{kind}_l{i}{sfx}").detach().numpy()
    for i, lin in enumerate((lin0, lin1)):
        state[f"linear.{i}.weight"] = lin.weight.detach().numpy()
        state[f"linear.{i}.bias"] = lin.bias.detach().numpy()
    state["classifier.weight"] = classifier.weight.detach().numpy()
    state["classifier.bias"] = classifier.bias.detach().numpy()

    model = SSeRiouSS(
        wav2vec=dict(hidden=64, layers=2, heads=4, ffn=128,
                     conv_channels=32, rel_pos_bias=False, pre_ln=False,
                     conv_norm="group"),
        lstm={"hidden_size": 16, "num_layers": 2},
        linear={"hidden_size": 24, "num_layers": 2})
    model.specifications = Specifications(
        problem=Problem.MONO_LABEL_CLASSIFICATION,
        resolution=Resolution.FRAME, duration=1.0,
        classes=["a", "b", "c"], powerset_max_classes=2)
    model.build()
    model.params = jax.tree_util.tree_map(
        jnp.asarray, model.convert_torch_state_dict(state))
    model._jitted_apply = None
    ours = np.asarray(model(jnp.asarray(wav.numpy())))
    assert ours.shape == expected.shape
    np.testing.assert_allclose(ours, expected, atol=5e-4)


# --------------------------------------------------------------- ToTaToNet

class TorchGlobLN(tnn.Module):
    """asteroid GlobLN: stats over all non-batch dims, (C,) gamma/beta."""

    def __init__(self, chan):
        super().__init__()
        self.gamma = tnn.Parameter(torch.ones(chan))
        self.beta = tnn.Parameter(torch.zeros(chan))

    def forward(self, x):          # (B, C, ...)
        dims = tuple(range(1, x.dim()))
        mean = x.mean(dim=dims, keepdim=True)
        var = x.var(dim=dims, keepdim=True, unbiased=False)
        shape = (1, -1) + (1,) * (x.dim() - 2)
        return (x - mean) / torch.sqrt(var + 1e-8) \
            * self.gamma.view(shape) + self.beta.view(shape)


class TorchSingleRNN(tnn.Module):
    def __init__(self, in_chan, hid, bidirectional=True):
        super().__init__()
        self.rnn = tnn.LSTM(in_chan, hid, batch_first=True,
                            bidirectional=bidirectional)

    def forward(self, x):
        return self.rnn(x)[0]


class TorchDPRNNBlock(tnn.Module):
    """asteroid masknn.recurrent.DPRNNBlock, verbatim semantics."""

    def __init__(self, bn_chan, hid):
        super().__init__()
        self.intra_RNN = TorchSingleRNN(bn_chan, hid)
        self.inter_RNN = TorchSingleRNN(bn_chan, hid)
        self.intra_linear = tnn.Linear(hid * 2, bn_chan)
        self.inter_linear = tnn.Linear(hid * 2, bn_chan)
        self.intra_norm = TorchGlobLN(bn_chan)
        self.inter_norm = TorchGlobLN(bn_chan)

    def forward(self, x):          # (B, N, K, L)
        B, N, K, L = x.size()
        output = x
        x = x.transpose(1, -1).reshape(B * L, K, N)
        x = self.intra_linear(self.intra_RNN(x))
        x = x.reshape(B, L, K, N).transpose(1, -1)
        output = output + self.intra_norm(x)
        x = output.transpose(1, 2).transpose(2, -1).reshape(B * K, L, N)
        x = self.inter_linear(self.inter_RNN(x))
        x = x.reshape(B, K, L, N).transpose(1, -1).transpose(2, -1)
        return output + self.inter_norm(x)


class TorchDPRNN(tnn.Module):
    """asteroid masknn.recurrent.DPRNN, verbatim semantics."""

    def __init__(self, in_chan, out_chan, n_src, bn_chan, hid, chunk,
                 n_repeats):
        super().__init__()
        self.n_src, self.bn_chan = n_src, bn_chan
        self.out_chan, self.chunk_size = out_chan, chunk
        self.hop_size = chunk // 2
        self.bottleneck = tnn.Sequential(
            TorchGlobLN(in_chan), tnn.Conv1d(in_chan, bn_chan, 1))
        self.net = tnn.Sequential(*[TorchDPRNNBlock(bn_chan, hid)
                                    for _ in range(n_repeats)])
        self.first_out = tnn.Sequential(
            tnn.PReLU(), tnn.Conv2d(bn_chan, n_src * bn_chan, 1))
        # asteroid keeps the gate bn_chan-wide, then a final bias-free
        # 1x1 conv projects to out_chan (masknn.recurrent.DPRNN)
        self.net_out = tnn.Sequential(tnn.Conv1d(bn_chan, bn_chan, 1),
                                      tnn.Tanh())
        self.net_gate = tnn.Sequential(tnn.Conv1d(bn_chan, bn_chan, 1),
                                       tnn.Sigmoid())
        self.mask_net = tnn.Conv1d(bn_chan, out_chan, 1, bias=False)

    def forward(self, mixture_w):  # (B, in_chan, T)
        batch, _, n_frames = mixture_w.size()
        output = self.bottleneck(mixture_w)
        output = F.unfold(output.unsqueeze(-1),
                          kernel_size=(self.chunk_size, 1),
                          padding=(self.chunk_size, 0),
                          stride=(self.hop_size, 1))
        n_chunks = output.shape[-1]
        output = output.reshape(batch, self.bn_chan, self.chunk_size,
                                n_chunks)
        output = self.net(output)
        output = self.first_out(output)
        output = output.reshape(batch * self.n_src, self.bn_chan,
                                self.chunk_size, n_chunks)
        to_unfold = self.bn_chan * self.chunk_size
        output = F.fold(output.reshape(batch * self.n_src, to_unfold,
                                       n_chunks),
                        (n_frames, 1), kernel_size=(self.chunk_size, 1),
                        padding=(self.chunk_size, 0),
                        stride=(self.hop_size, 1))
        output = output.reshape(batch * self.n_src, self.bn_chan, -1)
        output = self.net_out(output) * self.net_gate(output)
        score = self.mask_net(output)
        score = score.reshape(batch, self.n_src, self.out_chan, n_frames)
        return F.relu(score)


class TorchToTaToNet(tnn.Module):
    """Reference-shaped ToTaToNet (no WavLM), asteroid enc/dec + DPRNN +
    avg-pool diarization head (reference ToTaToNet.py:175-237,316-360)."""

    def __init__(self, n_filters=16, kernel=32, stride=16, n_src=2,
                 bn_chan=32, hid=16, chunk=20, n_repeats=2, scaling=8):
        super().__init__()
        self.stride, self.n_src, self.scaling = stride, n_src, scaling
        self.enc_filters = tnn.Parameter(
            torch.randn(n_filters, 1, kernel) * 0.3)
        self.dec_filters = tnn.Parameter(
            torch.randn(n_filters, 1, kernel) * 0.3)
        self.masker = TorchDPRNN(n_filters, n_filters, n_src, bn_chan,
                                 hid, chunk, n_repeats)
        self.linear = tnn.ModuleList([tnn.Linear(n_filters, 64),
                                      tnn.Linear(64, 64)])
        self.classifier = tnn.Linear(64, 1)

    def forward(self, waveforms):  # (B, 1, S)
        bsz = waveforms.shape[0]
        tf_rep = F.conv1d(waveforms, self.enc_filters, stride=self.stride)
        masks = self.masker(tf_rep)
        masked = masks * tf_rep.unsqueeze(1)     # (B, n_src, F, T')
        flat = masked.flatten(0, 1)              # (B*n_src, F, T')
        decoded = F.conv_transpose1d(flat, self.dec_filters,
                                     stride=self.stride)
        pad = waveforms.shape[-1] - decoded.shape[-1]
        decoded = F.pad(decoded, (0, pad)) if pad >= 0 \
            else decoded[..., :waveforms.shape[-1]]
        sources = decoded.reshape(bsz, self.n_src, -1).transpose(1, 2)
        out = F.avg_pool1d(flat, self.scaling, stride=self.scaling)
        out = out.transpose(1, 2)                # (B*n_src, Td, F)
        for lin in self.linear:
            out = F.leaky_relu(lin(out))
        out = self.classifier(out)
        out = out.reshape(bsz, self.n_src, -1).transpose(1, 2)
        return torch.sigmoid(out), sources

    def reference_state_dict(self):
        sd = {"encoder.filterbank._filters": self.enc_filters,
              "decoder.filterbank._filters": self.dec_filters,
              "classifier.weight": self.classifier.weight,
              "classifier.bias": self.classifier.bias}
        for i, lin in enumerate(self.linear):
            sd[f"linear.{i}.weight"] = lin.weight
            sd[f"linear.{i}.bias"] = lin.bias
        for k, v in self.masker.state_dict().items():
            sd[f"masker.{k}"] = v
        return {k: v.detach().numpy() for k, v in sd.items()}


def test_totatonet_matches_torch_replica():
    from pyannote_audio_tpu.models.separation.totatonet import ToTaToNet

    torch.manual_seed(4)
    ref = TorchToTaToNet()
    ref.eval()
    wav = torch.randn(2, 1, 8000) * 0.1
    with torch.no_grad():
        exp_diar, exp_sources = ref(wav)

    model = ToTaToNet(
        encoder_decoder={"n_filters": 16, "kernel_size": 32, "stride": 16},
        dprnn={"n_repeats": 2, "bn_chan": 32, "hid_size": 16,
               "chunk_size": 20},
        n_sources=2, use_wavlm=False)
    model.build()
    model.params = jax.tree_util.tree_map(
        jnp.asarray,
        model.convert_torch_state_dict(ref.reference_state_dict()))
    model._jitted_apply = None
    diar, sources = model(jnp.asarray(wav.numpy()))
    diar, sources = np.asarray(diar), np.asarray(sources)
    assert diar.shape == tuple(exp_diar.shape)
    assert sources.shape == tuple(exp_sources.shape)
    np.testing.assert_allclose(diar, exp_diar.numpy(), atol=2e-4)
    np.testing.assert_allclose(sources, exp_sources.numpy(), atol=2e-4)


def test_totatonet_wavlm_checkpoint_roundtrip(tmp_path):
    """A ToTaToNet whose WavLM branch was reconstructed from a PixIT
    checkpoint must save_checkpoint -> from_pretrained cleanly (the
    wavlm_config is persisted; weights ride params.msgpack)."""
    from transformers import WavLMConfig, WavLMModel

    from pyannote_audio_tpu.core.model import Model
    from pyannote_audio_tpu.models.separation.totatonet import ToTaToNet

    torch.manual_seed(13)
    wavlm = WavLMModel(WavLMConfig(do_stable_layer_norm=False,
                                   feat_extract_norm="group", **_TINY))
    ref = TorchToTaToNet(n_filters=16, kernel=32, stride=16, n_src=2,
                         bn_chan=32, hid=16, chunk=20, n_repeats=2)
    ref.masker = TorchDPRNN(16 + 64, 16, 2, 32, 16, 20, 2)
    state = ref.reference_state_dict()
    for k, v in wavlm.state_dict().items():
        state[f"wavlm.{k}"] = v.detach().numpy()

    model = ToTaToNet(
        encoder_decoder={"n_filters": 16, "kernel_size": 32, "stride": 16},
        dprnn={"n_repeats": 2, "bn_chan": 32, "hid_size": 16,
               "chunk_size": 20},
        n_sources=2, use_wavlm=False)
    model.specifications = model._specifications
    model.build()
    model.params = jax.tree_util.tree_map(
        jnp.asarray, model.convert_torch_state_dict(state))
    model._jitted_apply = None
    wav = np.random.default_rng(0).normal(
        size=(1, 1, 8000)).astype(np.float32) * 0.1
    before = [np.asarray(o) for o in model(jnp.asarray(wav))]

    model.save_checkpoint(tmp_path / "ckpt")
    loaded = Model.from_pretrained(tmp_path / "ckpt")
    assert loaded.use_wavlm and loaded.wavlm_config is not None
    after = [np.asarray(o) for o in loaded(jnp.asarray(wav))]
    for b, a in zip(before, after):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_totatonet_with_embedded_wavlm_matches_torch():
    """A PixIT checkpoint carrying its fine-tuned WavLM (reference
    default use_wavlm=True, HF keys under "wavlm.") reconstructs the
    branch from the checkpoint alone and matches the torch composition
    (reference ToTaToNet.py:179-196, 330-340)."""
    from transformers import WavLMConfig, WavLMModel

    from pyannote_audio_tpu.models.separation.totatonet import ToTaToNet

    torch.manual_seed(11)
    wavlm = WavLMModel(WavLMConfig(do_stable_layer_norm=False,
                                   feat_extract_norm="group", **_TINY))
    wavlm.eval()
    hidden = 64
    ref = TorchToTaToNet(n_filters=16, kernel=32, stride=16, n_src=2,
                         bn_chan=32, hid=16, chunk=20, n_repeats=2)
    # widen the masker input for the concatenated WavLM features
    ref.masker = TorchDPRNN(16 + hidden, 16, 2, 32, 16, 20, 2)
    ref.eval()
    scaling = 320 // 16

    wav = torch.randn(2, 1, 8000) * 0.1
    with torch.no_grad():
        tf_rep = F.conv1d(wav, ref.enc_filters, stride=16)
        w = wavlm(wav[:, 0]).last_hidden_state.transpose(1, 2)
        w = w.repeat_interleave(scaling, dim=-1)
        pad = tf_rep.shape[-1] - w.shape[-1]
        w = F.pad(w, (0, pad)) if pad >= 0 else w[..., :tf_rep.shape[-1]]
        masks = ref.masker(torch.cat((tf_rep, w), dim=1))
        masked = masks * tf_rep.unsqueeze(1)
        flat = masked.flatten(0, 1)
        decoded = F.conv_transpose1d(flat, ref.dec_filters, stride=16)
        pad = wav.shape[-1] - decoded.shape[-1]
        decoded = F.pad(decoded, (0, pad)) if pad >= 0 \
            else decoded[..., :wav.shape[-1]]
        exp_sources = decoded.reshape(2, 2, -1).transpose(1, 2)
        out = F.avg_pool1d(flat, ref.scaling, stride=ref.scaling)
        out = out.transpose(1, 2)
        for lin in ref.linear:
            out = F.leaky_relu(lin(out))
        out = ref.classifier(out)
        exp_diar = torch.sigmoid(
            out.reshape(2, 2, -1).transpose(1, 2))

    state = ref.reference_state_dict()
    for k, v in wavlm.state_dict().items():
        state[f"wavlm.{k}"] = v.detach().numpy()

    model = ToTaToNet(
        encoder_decoder={"n_filters": 16, "kernel_size": 32, "stride": 16},
        dprnn={"n_repeats": 2, "bn_chan": 32, "hid_size": 16,
               "chunk_size": 20},
        n_sources=2, use_wavlm=False)     # branch comes from the ckpt
    model.build()
    model.params = jax.tree_util.tree_map(
        jnp.asarray, model.convert_torch_state_dict(state))
    model._jitted_apply = None
    assert model.use_wavlm
    diar, sources = model(jnp.asarray(wav.numpy()))
    np.testing.assert_allclose(np.asarray(sources),
                               exp_sources.numpy(), atol=5e-4)
    np.testing.assert_allclose(np.asarray(diar), exp_diar.numpy(),
                               atol=5e-4)


def test_pyannet_seg_bf16_gate(monkeypatch):
    """PYANNOTE_TPU_SEG_BF16 halves SincNet MXU precision but not its
    decisions: outputs stay close to the f32 path (log-softmax scores),
    params are bit-identical (only operands are cast)."""
    import jax
    import numpy as np

    from pyannote_audio_tpu.core.model import (Problem, Resolution,
                                               Specifications)
    from pyannote_audio_tpu.models.segmentation.pyannet import PyanNet

    model = PyanNet()
    model.specifications = Specifications(
        problem=Problem.MONO_LABEL_CLASSIFICATION,
        resolution=Resolution.FRAME, duration=2.0,
        classes=["a", "b"], powerset_max_classes=2)
    model.build()
    wav = (0.1 * np.random.default_rng(0)
           .standard_normal((2, 1, 32000))).astype(np.float32)
    ref = np.asarray(model(wav))

    monkeypatch.setenv("PYANNOTE_TPU_SEG_BF16", "1")
    # fresh trace: the gate is resolved at trace time
    out = np.asarray(
        jax.jit(lambda p, x: model.module.apply(p, x))(model.params, wav))
    monkeypatch.delenv("PYANNOTE_TPU_SEG_BF16")
    assert out.shape == ref.shape
    # log-softmax scores: bf16 conv error stays small after the LSTM/head
    assert np.max(np.abs(out - ref)) < 0.35, np.max(np.abs(out - ref))
    # decisions agree nearly everywhere
    agree = np.mean(out.argmax(-1) == ref.argmax(-1))
    assert agree > 0.99, agree

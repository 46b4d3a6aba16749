"""Model base: functional JAX models with a config-driven checkpoint format.

TPU-native rebuild of the reference's ``Model(lightning.LightningModule)``
(/root/reference/src/pyannote/audio/core/model.py). Design differences
(SURVEY.md §7.0):

  * A model is a *parameter pytree* + a pure ``apply`` function (flax.linen
    under the hood) — no module mutation, no lightning. ``Model.__call__``
    is jit-compiled once per input shape.
  * Checkpoints are a directory: ``config.yaml`` (architecture class path,
    hyperparameters, specifications, versions — the reference's
    ``checkpoint["pyannote.audio"]`` vendor block, model.py:244-256) +
    ``params.msgpack`` (flax serialization).
  * ``from_pretrained`` dynamically imports the saved class (parity with
    model.py:611-614) and also accepts torch ``pytorch_model.bin``
    checkpoints via each architecture's ``convert_torch_state_dict``.
"""

from __future__ import annotations

import importlib
from dataclasses import dataclass, field
from enum import Enum
from functools import cached_property, partial
from pathlib import Path
from typing import Any, Dict, List, Optional, Text, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from .segment import SlidingWindow


class Problem(Enum):
    """Parity: Problem enum (reference core/task.py:59)."""

    BINARY_CLASSIFICATION = 0
    MONO_LABEL_CLASSIFICATION = 1
    MULTI_LABEL_CLASSIFICATION = 2
    REPRESENTATION = 3
    REGRESSION = 4


class Resolution(Enum):
    """Parity: Resolution enum (reference core/task.py:71)."""

    FRAME = 1
    CHUNK = 2


class UnknownSpecificationsError(Exception):
    pass


@dataclass(frozen=True)
class Specifications:
    """What a model predicts (parity: reference core/task.py:80-137)."""

    problem: Problem
    resolution: Resolution
    duration: Optional[float] = None
    min_duration: Optional[float] = None
    warm_up: Tuple[float, float] = (0.0, 0.0)
    classes: Optional[List[Text]] = None
    powerset_max_classes: Optional[int] = None
    permutation_invariant: bool = False

    @cached_property
    def powerset(self) -> bool:
        if self.powerset_max_classes is None:
            return False
        if self.problem != Problem.MONO_LABEL_CLASSIFICATION:
            raise ValueError(
                "powerset_max_classes requires MONO_LABEL_CLASSIFICATION")
        return True

    @cached_property
    def num_powerset_classes(self) -> int:
        # sum_{k=0..powerset_max_classes} C(len(classes), k)
        from scipy.special import binom
        return int(sum(binom(len(self.classes), k)
                       for k in range(self.powerset_max_classes + 1)))

    def __len__(self):
        return 1

    def __iter__(self):
        yield self

    def to_dict(self) -> Dict[str, Any]:
        return {
            "problem": self.problem.name,
            "resolution": self.resolution.name,
            "duration": self.duration,
            "min_duration": self.min_duration,
            "warm_up": list(self.warm_up),
            "classes": self.classes,
            "powerset_max_classes": self.powerset_max_classes,
            "permutation_invariant": self.permutation_invariant,
        }

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "Specifications":
        d = dict(d)
        d["problem"] = Problem[d["problem"]]
        d["resolution"] = Resolution[d["resolution"]]
        d["warm_up"] = tuple(d.get("warm_up") or (0.0, 0.0))
        return cls(**d)


CHECKPOINT_CONFIG = "config.yaml"
CHECKPOINT_PARAMS = "params.msgpack"


class Introspection:
    """Empty legacy-compat class.

    Parity: Introspection (reference core/model.py:58-59) — kept only so
    old pickled checkpoints referencing it can unpickle."""


@dataclass
class Output:
    """Frame-level output description.

    Parity: Output (reference core/model.py:62-66)."""
    num_frames: int
    dimension: int
    frames: SlidingWindow


class Model:
    """Base class for all architectures.

    Subclasses must implement:
      * ``build_module() -> flax.linen.Module``
      * ``num_frames(num_samples) -> int`` (FRAME-resolution models)
      * optionally ``convert_torch_state_dict(state) -> params`` for loading
        reference checkpoints.
    """

    def __init__(
        self,
        sample_rate: int = 16000,
        num_channels: int = 1,
        task: Optional[Any] = None,
        **hparams,
    ):
        self.sample_rate = sample_rate
        self.num_channels = num_channels
        self.hparams: Dict[str, Any] = dict(hparams)
        self.task = task
        self._specifications: Optional[Specifications] = None
        self.module = None
        #: top-level module names whose parameters the trainer must not
        #: update (consumed as optimizer-mask prefixes by Trainer.fit)
        self.frozen_modules: List[str] = []
        self.params = None
        self._jitted_apply = None

    # -- specifications ----------------------------------------------------

    @property
    def specifications(self) -> Union[Specifications,
                                      Tuple[Specifications, ...]]:
        if self.task is not None:
            return self.task.specifications
        if self._specifications is None:
            raise UnknownSpecificationsError(
                "Model has no specifications. Attach a task or load a "
                "pretrained checkpoint.")
        return self._specifications

    @specifications.setter
    def specifications(self, specs):
        self._specifications = specs

    # -- architecture ------------------------------------------------------

    def build_module(self):
        raise NotImplementedError

    def example_input_array(self, duration: Optional[float] = None
                            ) -> jnp.ndarray:
        specs = self.specifications
        spec = specs if isinstance(specs, Specifications) else specs[0]
        duration = duration or spec.duration or 2.0
        n = int(round(duration * self.sample_rate))
        return jnp.zeros((1, self.num_channels, n), dtype=jnp.float32)

    def build(self, rng: Optional[jax.Array] = None) -> "Model":
        """Construct the module and (re)initialize missing parameters."""
        self.module = self.build_module()
        if self.params is None:
            if rng is None:
                rng = jax.random.PRNGKey(0)
            # jit the initializer: eager init dispatches the whole forward
            # op-by-op (very slow for scan-based models)
            self.params = jax.jit(self.module.init)(
                rng, self.example_input_array())
        self._jitted_apply = None
        return self

    def apply_fn(self, params, waveforms, **kwargs):
        return self.module.apply(params, waveforms, **kwargs)

    def __call__(self, waveforms, **kwargs):
        """Jitted forward: (batch, channel, samples) -> model output."""
        if self.module is None:
            self.build()
        if self._jitted_apply is None:
            self._jitted_apply = jax.jit(self.apply_fn)
        return self._jitted_apply(self.params, jnp.asarray(waveforms),
                                  **kwargs)

    # -- device management (torch-API parity; placement is XLA's job) ------

    def to(self, device=None) -> "Model":
        return self

    def eval(self) -> "Model":
        return self

    def train(self, mode: bool = True) -> "Model":
        return self

    # -- frame math --------------------------------------------------------

    def num_frames(self, num_samples: int) -> int:
        raise NotImplementedError

    def receptive_field_size(self, num_frames: int = 1) -> int:
        raise NotImplementedError

    def receptive_field_center(self, frame: int = 0) -> int:
        raise NotImplementedError

    @property
    def receptive_field(self) -> SlidingWindow:
        """Output frames as a SlidingWindow (reference model.py:168-183)."""
        size = self.receptive_field_size(num_frames=1)
        step = (self.receptive_field_center(frame=1)
                - self.receptive_field_center(frame=0))
        center = self.receptive_field_center(frame=0)
        return SlidingWindow(
            duration=size / self.sample_rate,
            step=step / self.sample_rate,
            start=(center - (size - 1) / 2) / self.sample_rate,
        )

    @property
    def dimension(self) -> int:
        """Output dimension (classes or embedding size)."""
        specs = self.specifications
        spec = specs if isinstance(specs, Specifications) else specs[0]
        if spec.powerset:
            return spec.num_powerset_classes
        if spec.classes is not None:
            return len(spec.classes)
        raise ValueError("specifications do not define a dimension")

    def default_activation(self):
        """Default output activation for the task specification.

        Parity: default_activation (reference model.py:271-295): sigmoid
        for binary/multi-label problems, log-softmax for mono-label
        (incl. powerset) classification — returned as jax callables
        (tuple for multi-task specifications).
        """
        import jax.nn

        def one(spec: Specifications):
            if spec.problem in (Problem.BINARY_CLASSIFICATION,
                                Problem.MULTI_LABEL_CLASSIFICATION):
                return jax.nn.sigmoid
            if spec.problem == Problem.MONO_LABEL_CLASSIFICATION:
                return partial(jax.nn.log_softmax, axis=-1)
            raise ValueError(
                f"no default activation for problem {spec.problem}")

        specs = self.specifications
        if isinstance(specs, Specifications):
            return one(specs)
        return tuple(one(s) for s in specs)

    def forward(self, *args, **kwargs):
        """torch-habit alias of ``__call__`` (reference model.py forward)."""
        return self(*args, **kwargs)

    # -- freezing ----------------------------------------------------------
    # In a functional stack, freezing is an optimizer-mask concern: these
    # return pytree masks consumed by optax.masked (parity with the intent of
    # reference model.py:359-495 freeze_up_to/by_name). The stateful
    # freeze_by_name/up_to API below records top-level module names in
    # ``frozen_modules``, which Trainer.fit seeds its optimizer-mask
    # prefixes from.

    def _top_level_modules(self) -> List[str]:
        if self.params is None:
            raise ValueError(
                "build the model (or load a checkpoint) before freezing "
                "modules")
        return list(self.params.get("params", {}).keys())

    def freeze_by_name(self, modules, recurse: bool = True) -> List[str]:
        """Freeze modules by top-level name.

        Parity: freeze_by_name (reference model.py:439-468). ``recurse``
        is accepted for signature parity; freezing always covers the
        whole subtree here (the optimizer mask zeroes every parameter
        under the module path).
        """
        names = [modules] if isinstance(modules, str) else list(modules)
        known = self._top_level_modules()
        missing = [name for name in names if name not in known]
        if missing:
            raise ValueError(
                f"Could not find the following modules: {missing}.")
        for name in names:
            if name not in self.frozen_modules:
                self.frozen_modules.append(name)
        return names

    def unfreeze_by_name(self, modules, recurse: bool = True) -> List[str]:
        """Parity: unfreeze_by_name (reference model.py:470-495)."""
        names = [modules] if isinstance(modules, str) else list(modules)
        known = self._top_level_modules()
        missing = [name for name in names if name not in known]
        if missing:
            raise ValueError(
                f"Could not find the following modules: {missing}.")
        self.frozen_modules = [name for name in self.frozen_modules
                               if name not in names]
        return names

    def freeze_up_to(self, module_name: str) -> List[str]:
        """Freeze every top-level module up to (and incl.) ``module_name``.

        Parity: freeze_up_to (reference model.py:359-382); module order
        is the parameter-tree order."""
        known = self._top_level_modules()
        if module_name not in known:
            raise ValueError(
                f"Could not find the following modules: [{module_name!r}].")
        return self.freeze_by_name(known[:known.index(module_name) + 1])

    def unfreeze_up_to(self, module_name: str) -> List[str]:
        """Parity: unfreeze_up_to (reference model.py:384-407)."""
        known = self._top_level_modules()
        if module_name not in known:
            raise ValueError(
                f"Could not find the following modules: [{module_name!r}].")
        return self.unfreeze_by_name(known[:known.index(module_name) + 1])

    @staticmethod
    def _resolve_hub_id(model_id: str, revision=None, token=None,
                        cache_dir=None, subfolder=None):
        """Hub-id -> local checkpoint path (dir or torch .bin), or None.

        Local snapshots (PYANNOTE_TPU_HUB / download cache) win; else
        download the native checkpoint pair, falling back to the torch
        ``pytorch_model.bin`` (what the reference hosts on the hub)."""
        import urllib.error
        import warnings

        from ..utils.hf_hub import (AssetFileName, download_from_hf_hub,
                                    looks_like_hub_id, resolve_checkpoint)

        def complete(local: Path) -> bool:
            # a failed download leaves an empty/partial cache dir behind
            # (mkdir runs before urlopen); returning it as-is would
            # permanently block re-downloading until the user deletes it
            if local.is_file():
                return True
            return ((local / CHECKPOINT_CONFIG).exists()
                    and ((local / CHECKPOINT_PARAMS).exists()
                         or (local / "orbax").exists())) \
                or (local / str(AssetFileName.TorchModel)).exists()

        local = None
        try:
            local = resolve_checkpoint(model_id, subfolder=subfolder,
                                       revision=revision)
            if complete(local):
                return local
        except FileNotFoundError:
            pass
        if not looks_like_hub_id(model_id):
            return local
        last_error = None
        try:
            params = download_from_hf_hub(
                model_id, AssetFileName.Model, subfolder=subfolder,
                revision=revision, token=token, cache_dir=cache_dir)
            download_from_hf_hub(model_id, CHECKPOINT_CONFIG,
                                 subfolder=subfolder, revision=revision,
                                 token=token, cache_dir=cache_dir)
            return params.parent
        except (FileNotFoundError, urllib.error.HTTPError) as exc:
            last_error = exc
        try:
            return download_from_hf_hub(
                model_id, AssetFileName.TorchModel, subfolder=subfolder,
                revision=revision, token=token, cache_dir=cache_dir)
        except (FileNotFoundError, urllib.error.HTTPError) as exc:
            # surface the root cause (auth? network? missing asset?)
            # instead of letting the caller raise a bare 'cannot load'
            warnings.warn(
                f"hub download of {model_id!r} failed: "
                f"{last_error or exc}")
            return local

    def frozen_mask(self, frozen_prefixes: List[str]) -> Any:
        def mask_fn(path, _leaf):
            parts = [str(getattr(p, "key", getattr(p, "idx", p)))
                     for p in path]
            path_str = "/".join(parts)
            # PREFIX semantics on path components (same rule as the
            # trainer's update freeze): 'lstm' freezes params/lstm/* but
            # never 'pre_lstm_proj' or 'bilstm' — substring matching
            # silently froze unrelated parameters
            frozen = any(path_str == prefix
                         or path_str.startswith(prefix + "/")
                         or any(part == prefix for part in parts)
                         for prefix in frozen_prefixes)
            return not frozen
        return jax.tree_util.tree_map_with_path(mask_fn, self.params)

    # -- checkpointing -----------------------------------------------------

    def to_checkpoint_dict(self) -> Dict[str, Any]:
        from .. import __version__
        specs = self.specifications
        if isinstance(specs, Specifications):
            specs_dict = specs.to_dict()
        else:
            specs_dict = [s.to_dict() for s in specs]
        return {
            "pyannote_audio_tpu": {
                "version": __version__,
                "architecture": {
                    "module": type(self).__module__,
                    "class": type(self).__name__,
                },
                "specifications": specs_dict,
            },
            "hparams": {
                "sample_rate": self.sample_rate,
                "num_channels": self.num_channels,
                **_to_plain(self.hparams),
            },
        }

    def save_checkpoint(self, path: Union[str, Path],
                        use_orbax: bool = False) -> None:
        """Write config.yaml + parameters.

        ``use_orbax=True`` writes an orbax checkpoint directory instead of
        the msgpack blob — the TPU-native choice for sharded / multi-host
        parameters (orbax handles per-shard files and atomic commits).
        """
        import os
        import uuid

        from flax import serialization
        path = Path(path)
        path.mkdir(parents=True, exist_ok=True)

        def atomic_write(target: Path, data: bytes) -> None:
            # the trainer re-saves `best/` in place on every metric
            # improvement: a kill mid-write must never destroy the
            # previously good copy (tmp + os.replace, repo convention)
            tmp = target.with_name(
                f".{target.name}.{os.getpid()}-{uuid.uuid4().hex[:8]}")
            try:
                tmp.write_bytes(data)
                os.replace(tmp, target)
            finally:
                tmp.unlink(missing_ok=True)

        atomic_write(path / CHECKPOINT_CONFIG,
                     yaml.safe_dump(self.to_checkpoint_dict()).encode())
        if self.params is None:
            self.build()
        if use_orbax:
            import orbax.checkpoint as ocp
            with ocp.StandardCheckpointer() as checkpointer:
                checkpointer.save(
                    (path / "orbax").absolute(),
                    jax.tree_util.tree_map(np.asarray, self.params),
                    force=True)
        else:
            atomic_write(path / CHECKPOINT_PARAMS,
                         serialization.to_bytes(self.params))

    @classmethod
    def from_pretrained(
        cls,
        checkpoint: Union[str, Path, Dict],
        map_location: Optional[str] = None,
        strict: bool = True,
        **kwargs,
    ) -> "Model":
        """Load from a checkpoint directory, a torch .bin file, or a hub id.

        Parity: Model.from_pretrained (reference core/model.py:497-655).
        A non-path string resolves as a hub id through
        utils/hf_hub.py: local snapshot roots first, then an HTTP
        download of the native checkpoint (or, failing that, the torch
        ``pytorch_model.bin`` the reference hosts).
        """
        from flax import serialization

        path = Path(checkpoint) if isinstance(checkpoint, (str, Path)) \
            else None
        # hub-only kwargs must never leak into model hparams (a local
        # load with token=... would otherwise construct Klass(token=...))
        revision = kwargs.pop("revision", None)
        token = kwargs.pop("use_auth_token", kwargs.pop("token", None))
        cache_dir = kwargs.pop("cache_dir", None)
        subfolder = kwargs.pop("subfolder", None)
        if path is not None and path.is_file() and \
                path.suffix in (".bin", ".ckpt", ".pt"):
            return cls._from_torch_checkpoint(path, **kwargs)
        if path is not None and not path.exists() \
                and isinstance(checkpoint, str):
            resolved = cls._resolve_hub_id(
                checkpoint, revision=revision, token=token,
                cache_dir=cache_dir, subfolder=subfolder)
            if resolved is not None:
                return cls.from_pretrained(resolved,
                                           map_location=map_location,
                                           strict=strict, **kwargs)
        if path is None or not path.is_dir():
            raise ValueError(f"cannot load checkpoint {checkpoint!r}")
        if not (path / CHECKPOINT_CONFIG).exists():
            # untouched reference snapshot directory
            for name in ("pytorch_model.bin", "model.ckpt", "model.pt"):
                if (path / name).exists():
                    return cls._from_torch_checkpoint(path / name,
                                                      **kwargs)
            raise ValueError(
                f"{path} holds neither a native checkpoint "
                f"({CHECKPOINT_CONFIG}) nor a torch one")
        with open(path / CHECKPOINT_CONFIG) as f:
            config = yaml.safe_load(f)
        vendor = config["pyannote_audio_tpu"]
        module = importlib.import_module(vendor["architecture"]["module"])
        Klass = getattr(module, vendor["architecture"]["class"])
        if cls not in (Model,) and not issubclass(Klass, cls):
            raise TypeError(f"checkpoint is a {Klass.__name__}, "
                            f"not a {cls.__name__}")
        hparams = dict(config.get("hparams") or {})
        hparams.update(kwargs)
        model = Klass(**hparams)
        specs = vendor.get("specifications")
        if isinstance(specs, list):
            model.specifications = tuple(
                Specifications.from_dict(s) for s in specs)
        elif specs is not None:
            model.specifications = Specifications.from_dict(specs)
        model.build()
        if (path / CHECKPOINT_PARAMS).exists():
            with open(path / CHECKPOINT_PARAMS, "rb") as f:
                model.params = serialization.from_bytes(model.params,
                                                        f.read())
        elif (path / "orbax").exists():
            import orbax.checkpoint as ocp
            with ocp.StandardCheckpointer() as checkpointer:
                restored = checkpointer.restore(
                    (path / "orbax").absolute(),
                    jax.tree_util.tree_map(np.asarray, model.params))
            model.params = jax.tree_util.tree_map(jnp.asarray, restored)
        else:
            raise FileNotFoundError(
                f"no parameters found in {path} "
                f"({CHECKPOINT_PARAMS} or orbax/)")
        model._jitted_apply = None
        return model

    @classmethod
    def _from_torch_checkpoint(cls, path: Path, **kwargs) -> "Model":
        """Load a reference (lightning) checkpoint: pytorch_model.bin.

        Reference checkpoints pickle ``pyannote.audio`` classes inside the
        vendor block (Specifications/Problem/Resolution, reference
        core/model.py:244-256); a shim unpickler maps them onto ours
        (identical field names and enum values).
        """
        import pickle

        import torch

        shims = {
            ("pyannote.audio.core.task", "Specifications"): Specifications,
            ("pyannote.audio.core.model", "Specifications"): Specifications,
            ("pyannote.audio.core.task", "Problem"): Problem,
            ("pyannote.audio.core.task", "Resolution"): Resolution,
        }

        class _ShimUnpickler(pickle.Unpickler):
            def find_class(self, module, name):
                if (module, name) in shims:
                    return shims[(module, name)]
                if module.startswith("pyannote.audio"):
                    # unknown reference-internal object: substitute a
                    # permissive namespace container
                    return _PermissiveShim
                return super().find_class(module, name)

        class _ShimPickleModule:
            Unpickler = _ShimUnpickler
            load = staticmethod(
                lambda f, **kw: _ShimUnpickler(f).load())

        ckpt = torch.load(path, map_location="cpu", weights_only=False,
                          pickle_module=_ShimPickleModule)
        return cls.from_torch_dict(ckpt, **kwargs)

    @classmethod
    def from_torch_dict(cls, ckpt: Dict[str, Any], **kwargs) -> "Model":
        vendor = ckpt.get("pyannote.audio", {})
        arch = vendor.get("architecture", {})
        klass_name = arch.get("class")
        Klass = cls
        if klass_name is not None and cls is Model:
            Klass = _resolve_architecture(klass_name)
        hparams = dict(ckpt.get("hyper_parameters") or {})
        hparams = {k: v for k, v in hparams.items()
                   if k not in ("task",)}
        hparams.update(kwargs)
        model = Klass(**_to_plain(hparams))
        specs = vendor.get("specifications")
        if specs is not None:
            model.specifications = _specs_from_torch(specs)
        model.build()
        state = ckpt.get("state_dict", ckpt)
        state = {k: np.asarray(v) for k, v in state.items()
                 if hasattr(v, "numpy") or isinstance(v, np.ndarray)}
        model.params = model.convert_torch_state_dict(state)
        model._jitted_apply = None
        return model

    def convert_torch_state_dict(self, state: Dict[str, np.ndarray]):
        raise NotImplementedError(
            f"{type(self).__name__} does not implement torch conversion")


class _PermissiveShim:
    """Stand-in for unpickled reference-internal objects we don't model."""

    def __init__(self, *args, **kwargs):
        self.args = args
        self.kwargs = kwargs

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)


def _resolve_architecture(class_name: str):
    """Map reference architecture class names to our implementations."""
    registry = {
        "PyanNet": "pyannote_audio_tpu.models.segmentation.pyannet",
        "SSeRiouSS": "pyannote_audio_tpu.models.segmentation.sseriouss",
        "XVectorMFCC": "pyannote_audio_tpu.models.embedding.xvector",
        "XVectorSincNet": "pyannote_audio_tpu.models.embedding.xvector",
        "WeSpeakerResNet34": "pyannote_audio_tpu.models.embedding.wespeaker",
        "ToTaToNet": "pyannote_audio_tpu.models.separation.totatonet",
        "SimpleSegmentationModel":
            "pyannote_audio_tpu.models.segmentation.debug",
        "SimpleEmbeddingModel": "pyannote_audio_tpu.models.embedding.debug",
    }
    if class_name not in registry:
        raise ValueError(f"unknown architecture {class_name!r}")
    module = importlib.import_module(registry[class_name])
    return getattr(module, class_name)


def _specs_from_torch(specs) -> Union[Specifications, Tuple]:
    def one(s):
        if isinstance(s, Specifications):
            return s
        get = (lambda k, d=None: getattr(s, k, d)) if not isinstance(s, dict) \
            else (lambda k, d=None: s.get(k, d))
        problem = get("problem")
        resolution = get("resolution")
        return Specifications(
            problem=Problem[problem.name] if hasattr(problem, "name")
            else Problem[str(problem)],
            resolution=Resolution[resolution.name]
            if hasattr(resolution, "name") else Resolution[str(resolution)],
            duration=get("duration"),
            min_duration=get("min_duration"),
            warm_up=tuple(get("warm_up") or (0.0, 0.0)),
            classes=get("classes"),
            powerset_max_classes=get("powerset_max_classes"),
            permutation_invariant=bool(get("permutation_invariant", False)),
        )
    if isinstance(specs, (list, tuple)):
        return tuple(one(s) for s in specs)
    return one(specs)


def _to_plain(obj):
    """Recursively convert numpy/containers to YAML-safe plain Python."""
    if isinstance(obj, dict):
        return {k: _to_plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_to_plain(v) for v in obj]
    if isinstance(obj, np.generic):
        return obj.item()
    return obj

"""Architecture configs.

The reference framework mutates ``nn.Module`` objects in place to realise a
pruned network and recovers architectures from checkpoint tensor shapes
(reference: utils/common.py:49-180, 315-707).  Here the architecture is an
explicit, immutable, JSON-serialisable dataclass: pruning emits a *new*
config, and checkpoints store the config next to the parameters.  Everything
downstream (module construction, analytic FLOPs profiling, pruning, weight
transfer) is a pure function of a config.

Channel-count semantics match the reference exactly:

* ``InceptionBlockConfig.res_channels[i]`` is the *final* mid-channel width of
  the i-th residual branch (the reference divides ``--channels`` by
  ``--channels_reduction_factor`` at construction time; we store the divided
  value — reference: models/modules/inception_modules.py:74-102).
* A branch whose width is 0 does not exist (reference skips it at build time,
  inception_modules.py:124-180).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass
from typing import Any, Optional, Tuple


# ---------------------------------------------------------------------------
# Normalisation spec
# ---------------------------------------------------------------------------

NORM_KINDS = ("instance", "batch", "syncbatch", "none")


@dataclass(frozen=True)
class NormConfig:
    """Normalisation-layer spec (reference: models/networks.py:29-64).

    Under GSPMD jit with the batch axis sharded over a device mesh, ``batch``
    and ``syncbatch`` are the same operation — the global-batch mean/variance
    reductions compile to ICI collectives.  Both kinds are kept so configs
    round-trip with the reference's flag surface.
    """

    kind: str = "instance"
    affine: bool = True
    track_running_stats: bool = False
    momentum: float = 0.1
    eps: float = 1e-5

    def __post_init__(self):
        if self.kind not in NORM_KINDS:
            raise ValueError(f"unknown norm kind {self.kind!r}")

    @property
    def is_batch_like(self) -> bool:
        return self.kind in ("batch", "syncbatch")

    @property
    def has_scale(self) -> bool:
        return self.affine and self.kind != "none"


# ---------------------------------------------------------------------------
# Inception (inverted-residual multi-branch) block
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class InceptionBlockConfig:
    """One multi-branch inverted-residual block.

    Residual branches: pad -> conv(k) -> norm -> act -> dropout -> pad ->
    conv(k) back to ``dim``.  Depthwise branches: conv(1x1) -> norm -> act ->
    pad -> depthwise conv(k) -> norm -> act -> dropout -> conv(1x1) back to
    ``dim``.  Output = x + pw_norm(sum of all branches).
    (reference: models/modules/inception_modules.py:124-236)
    """

    dim: int
    res_channels: Tuple[int, ...] = ()
    dw_channels: Tuple[int, ...] = ()
    res_kernels: Tuple[int, ...] = ()
    dw_kernels: Tuple[int, ...] = ()

    def __post_init__(self):
        if len(self.res_channels) != len(self.res_kernels):
            raise ValueError("res_channels and res_kernels length mismatch")
        if len(self.dw_channels) != len(self.dw_kernels):
            raise ValueError("dw_channels and dw_kernels length mismatch")

    @property
    def active_res(self) -> Tuple[Tuple[int, int, int], ...]:
        """(branch_index, mid_channels, kernel) for branches that exist."""
        return tuple(
            (i, c, k)
            for i, (c, k) in enumerate(zip(self.res_channels, self.res_kernels))
            if c > 0
        )

    @property
    def active_dw(self) -> Tuple[Tuple[int, int, int], ...]:
        return tuple(
            (i, c, k)
            for i, (c, k) in enumerate(zip(self.dw_channels, self.dw_kernels))
            if c > 0
        )

    @property
    def is_empty(self) -> bool:
        return not self.active_res and not self.active_dw


# ---------------------------------------------------------------------------
# ResNet-style inception generator (CycleGAN / pix2pix)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class InceptionGeneratorConfig:
    """``inception_9blocks`` generator (reference:
    models/modules/inception_architecture/inception_generator.py:12-145).

    Structure: ReflectPad(3) + 7x7 conv -> ds_channels[0], then
    len(ds_channels)-1 stride-2 3x3 convs; ``blocks`` inverted-residual
    blocks at ds_channels[-1]; then len(us_channels) stride-2 transposed
    convs -> us_channels[i]; ReflectPad(3) + 7x7 conv -> output_nc; tanh.

    Every conv (except the final output conv) is followed by norm + ReLU.
    """

    input_nc: int = 3
    output_nc: int = 3
    ds_channels: Tuple[int, ...] = (64, 128, 256)
    us_channels: Tuple[int, ...] = (128, 64)
    blocks: Tuple[InceptionBlockConfig, ...] = ()
    norm: NormConfig = NormConfig()
    padding_type: str = "reflect"  # reflect | replicate | zero
    active_fn: str = "relu"  # relu | relu6 | leaky_relu
    dropout_rate: float = 0.0

    def __post_init__(self):
        for b in self.blocks:
            if b.dim != self.ds_channels[-1]:
                raise ValueError(
                    f"block dim {b.dim} != bottleneck width {self.ds_channels[-1]}"
                )

    @property
    def n_blocks(self) -> int:
        return len(self.blocks)

    @property
    def bottleneck(self) -> int:
        return self.ds_channels[-1]

    # -- builders -----------------------------------------------------------

    @staticmethod
    def make(
        input_nc: int = 3,
        output_nc: int = 3,
        ngf: int = 64,
        channels: Optional[Tuple[int, ...]] = None,
        channels_reduction_factor: int = 1,
        kernel_sizes: Tuple[int, ...] = (3, 5, 7),
        n_blocks: int = 9,
        norm: NormConfig = NormConfig(),
        padding_type: str = "reflect",
        active_fn: str = "relu",
        dropout_rate: float = 0.0,
    ) -> "InceptionGeneratorConfig":
        """Uniform (teacher) generator, mirroring the reference defaults.

        With ``channels=None`` each branch's mid width is
        ``(4*ngf) // channels_reduction_factor``; with an int/sequence it is
        ``channels[i] // channels_reduction_factor``
        (reference: inception_modules.py:74-102).
        """
        if len(set(kernel_sizes)) != len(kernel_sizes):
            raise ValueError("duplicate kernel sizes are not allowed")
        bottleneck = ngf * 4
        if channels is None:
            mids = tuple(bottleneck // channels_reduction_factor for _ in kernel_sizes)
        elif isinstance(channels, int):
            mids = tuple(channels // channels_reduction_factor for _ in kernel_sizes)
        else:
            if len(channels) != len(kernel_sizes):
                raise ValueError("channels and kernel_sizes length mismatch")
            mids = tuple(c // channels_reduction_factor for c in channels)
        block = InceptionBlockConfig(
            dim=bottleneck,
            res_channels=mids,
            dw_channels=mids,
            res_kernels=tuple(kernel_sizes),
            dw_kernels=tuple(kernel_sizes),
        )
        return InceptionGeneratorConfig(
            input_nc=input_nc,
            output_nc=output_nc,
            ds_channels=(ngf, ngf * 2, ngf * 4),
            us_channels=(ngf * 2, ngf),
            blocks=tuple(block for _ in range(n_blocks)),
            norm=norm,
            padding_type=padding_type,
            active_fn=active_fn,
            dropout_rate=dropout_rate,
        )


# ---------------------------------------------------------------------------
# Discriminators
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class NLayerDiscriminatorConfig:
    """70x70 PatchGAN (reference: models/modules/discriminators.py:14-79)."""

    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3
    norm: NormConfig = NormConfig(kind="instance", affine=False)
    active_fn: str = "leaky_relu"


@dataclass(frozen=True)
class PixelDiscriminatorConfig:
    """1x1 PixelGAN (reference: discriminators.py:82-126)."""

    input_nc: int = 3
    ndf: int = 64
    norm: NormConfig = NormConfig(kind="instance", affine=False)
    active_fn: str = "leaky_relu"


# ---------------------------------------------------------------------------
# JSON round-trip (checkpoints store the architecture explicitly)
# ---------------------------------------------------------------------------

_CONFIG_TYPES = {}


def _register(cls):
    _CONFIG_TYPES[cls.__name__] = cls
    return cls


for _cls in (
    NormConfig,
    InceptionBlockConfig,
    InceptionGeneratorConfig,
    NLayerDiscriminatorConfig,
    PixelDiscriminatorConfig,
):
    _register(_cls)


def _to_dict(obj: Any) -> Any:
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        d = {"__type__": type(obj).__name__}
        for f in dataclasses.fields(obj):
            d[f.name] = _to_dict(getattr(obj, f.name))
        return d
    if isinstance(obj, tuple):
        return [_to_dict(x) for x in obj]
    if isinstance(obj, list):
        return [_to_dict(x) for x in obj]
    return obj


def _from_dict(d: Any) -> Any:
    if isinstance(d, dict) and "__type__" in d:
        cls = _CONFIG_TYPES.get(d["__type__"])
        if cls is None:
            # SPADE config types register on module import; a checkpoint
            # sidecar may be deserialised before any SPADE code path ran
            import cat_tpu.core.spade_config  # noqa: F401

            cls = _CONFIG_TYPES[d["__type__"]]
        kwargs = {}
        for f in dataclasses.fields(cls):
            if f.name in d:
                kwargs[f.name] = _from_dict(d[f.name])
        return cls(**kwargs)
    if isinstance(d, list):
        return tuple(_from_dict(x) for x in d)
    return d


def config_to_json(cfg: Any) -> str:
    return json.dumps(_to_dict(cfg), indent=2)


def config_from_json(s: str) -> Any:
    return _from_dict(json.loads(s))


def register_config(cls):
    """Register an additional config dataclass for JSON round-trip."""
    return _register(cls)

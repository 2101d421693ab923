"""Model registry, weight download / conversion / caching.

Replaces the reference's ``_setup_models`` / ``_download_model``
(/root/reference/video_upscaler.py:305-367). Weights are cached in two
stages under ``models_dir``:

1. ``{name}.pth``  — the released torch checkpoint (HTTP download, as in the
   reference's URL table at video_upscaler.py:344-348, plus the x2plus
   checkpoint the reference README advertises but never wires up).
2. ``{name}.npz``  — converted JAX weights (HWIO), the only file the runtime
   actually loads. Conversion happens once; torch is only needed for that
   step (it parses the pickle) and is imported lazily.

``random_model`` provides architecture-correct random weights for benchmarks
and tests in environments with no network egress.
"""

from __future__ import annotations

import dataclasses
import os
from pathlib import Path
from typing import Any, Callable, Dict, Union

import jax
import jax.numpy as jnp
import numpy as np

from video_restore_tpu.models.rrdbnet import (
    RRDBNetSpec,
    apply_rrdbnet,
    init_rrdbnet,
)
from video_restore_tpu.models.srvgg import SRVGGSpec, apply_srvgg, init_srvgg

Spec = Union[RRDBNetSpec, SRVGGSpec]


@dataclasses.dataclass(frozen=True)
class ZooEntry:
    spec: Spec
    url: str
    pth_name: str  # filename of the released checkpoint


# URL table mirrors video_upscaler.py:344-348; x2plus from the same upstream
# releases (advertised at reference README.md:27 but absent from its code).
MODEL_ZOO: Dict[str, ZooEntry] = {
    "RealESRGAN_x4plus": ZooEntry(
        RRDBNetSpec(num_block=23, scale=4),
        "https://github.com/xinntao/Real-ESRGAN/releases/download/v0.1.0/RealESRGAN_x4plus.pth",
        "RealESRGAN_x4plus.pth",
    ),
    "RealESRGAN_x4_v3": ZooEntry(
        SRVGGSpec(num_conv=32, scale=4),
        "https://github.com/xinntao/Real-ESRGAN/releases/download/v0.2.5.0/realesr-general-x4v3.pth",
        "realesr-general-x4v3.pth",
    ),
    "RealESRGAN_x4plus_anime_6B": ZooEntry(
        RRDBNetSpec(num_block=6, scale=4),
        "https://github.com/xinntao/Real-ESRGAN/releases/download/v0.2.2.4/RealESRGAN_x4plus_anime_6B.pth",
        "RealESRGAN_x4plus_anime_6B.pth",
    ),
    "RealESRGAN_x2plus": ZooEntry(
        RRDBNetSpec(num_block=23, scale=2),
        "https://github.com/xinntao/Real-ESRGAN/releases/download/v0.2.1/RealESRGAN_x2plus.pth",
        "RealESRGAN_x2plus.pth",
    ),
    # BSRGAN (reference README.md:3 advertises it; never wired there).
    # Same RRDB topology but the original ESRGAN/KAIR flavor: bare
    # state_dict, RRDB_trunk.* key naming, and for x2 a plain 3-channel
    # stem with a single upsample stage (no pixel-unshuffle).
    "BSRGAN": ZooEntry(
        RRDBNetSpec(num_block=23, scale=4, key_style="esrgan"),
        "https://github.com/cszn/KAIR/releases/download/v1.0/BSRGAN.pth",
        "BSRGAN.pth",
    ),
    "BSRGANx2": ZooEntry(
        RRDBNetSpec(num_block=23, scale=2, unshuffle=False,
                    key_style="esrgan"),
        "https://github.com/cszn/KAIR/releases/download/v1.0/BSRGANx2.pth",
        "BSRGANx2.pth",
    ),
}


@dataclasses.dataclass
class ModelHandle:
    """A loaded model: spec + params + apply function."""

    name: str
    spec: Spec
    params: Any

    @property
    def scale(self) -> int:
        return self.spec.scale

    def apply(self, x: jax.Array) -> jax.Array:
        if isinstance(self.spec, RRDBNetSpec):
            return apply_rrdbnet(self.params, x, self.spec)
        return apply_srvgg(self.params, x, self.spec)

    def apply_fn(
        self, differentiable: bool = False
    ) -> Callable[[Any, jax.Array], jax.Array]:
        """(params, x) -> y closure over the static spec (for pjit/scan).

        ``differentiable=True`` (training) forces pure-XLA execution —
        the Pallas production kernels define no VJP."""
        spec = self.spec
        if isinstance(spec, RRDBNetSpec):
            return lambda p, x: apply_rrdbnet(
                p, x, spec, differentiable=differentiable
            )
        if differentiable:  # SRVGG's stripe kernel has no VJP either
            return lambda p, x: apply_srvgg(p, x, spec, stripe=False)
        return lambda p, x: apply_srvgg(p, x, spec)

    def prepared(self, dtype, precision: str = "bf16") -> "tuple[Any, Callable]":
        """(prepared_params, apply_fn) with execution-mode weight
        transforms (regroup / sd kernels) done once, so the production
        step's program contains only the convs. ``precision`` ("bf16" /
        "int8") selects the stripe body's matmul precision (the W8A8
        path — models/rrdbnet.py default_precision); prepared params
        stay in ``dtype``, the int8 quantization happens in-jit."""
        m = self.cast(dtype)
        spec = self.spec
        if not isinstance(spec, RRDBNetSpec):
            return m.params, (
                lambda p, x: apply_srvgg(p, x, spec, precision=precision)
            )
        from video_restore_tpu.models.rrdbnet import (
            _apply,
            prepare_rrdbnet,
            resolve_mode,
        )

        mode = resolve_mode()
        pp = prepare_rrdbnet(
            m.params, mode, spec.num_feat, spec.num_grow_ch
        )

        def fn(p, x):
            return _apply(
                p, x, spec.scale,
                naive=mode == "naive",
                use_pallas=mode == "pallas",
                sd=mode == "sd",
                accum=mode == "accum",
                stripe=mode == "stripe",
                prepared=mode != "naive",
                unshuffle=spec.unshuffle,
                precision=precision if mode == "stripe" else "bf16",
            )

        return pp, fn

    def cast(self, dtype) -> "ModelHandle":
        params = jax.tree.map(
            lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a,
            self.params,
        )
        return ModelHandle(self.name, self.spec, params)


def model_spec(name: str) -> Spec:
    return MODEL_ZOO[name].spec


def _init(name: str, key: jax.Array, dtype=jnp.float32):
    spec = MODEL_ZOO[name].spec
    if isinstance(spec, RRDBNetSpec):
        return init_rrdbnet(key, spec, dtype)
    return init_srvgg(key, spec, dtype)


def random_model(name: str, seed: int = 0, dtype=jnp.float32) -> ModelHandle:
    """Architecture-correct random weights (benchmarks / egress-free tests)."""
    params = _init(name, jax.random.PRNGKey(seed), dtype)
    return ModelHandle(name, MODEL_ZOO[name].spec, params)


def _download(url: str, dest: Path) -> None:
    """Plain-urllib download (the reference shells out to basicsr's
    load_file_from_url, video_upscaler.py:362-364)."""
    import urllib.request

    tmp = dest.with_suffix(".part")
    with urllib.request.urlopen(url, timeout=60) as r, open(tmp, "wb") as f:
        while True:
            chunk = r.read(1 << 20)
            if not chunk:
                break
            f.write(chunk)
    os.replace(tmp, dest)


def save_params_npz(params: Any, path: Path) -> None:
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    arrays = {jax.tree_util.keystr(kp): np.asarray(v) for kp, v in flat}
    np.savez(path, **arrays)


def load_params_npz(name: str, path: Path) -> Any:
    """Rebuild the param pytree from the flat npz using a template pytree."""
    template = _init(name, jax.random.PRNGKey(0))
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    data = np.load(path)
    leaves = []
    for kp, tmpl in flat:
        arr = data[jax.tree_util.keystr(kp)]
        if arr.shape != tmpl.shape:
            raise ValueError(
                f"checkpoint/arch mismatch at {jax.tree_util.keystr(kp)}: "
                f"{arr.shape} vs {tmpl.shape}"
            )
        leaves.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def get_model(
    name: str,
    models_dir: Union[str, Path] = "models",
    *,
    dtype=jnp.float32,
    allow_download: bool = True,
    allow_random: bool = False,
    seed: int = 0,
) -> ModelHandle:
    """Load a zoo model: npz cache -> .pth conversion -> download -> (optional
    random fallback). Mirrors the reference's download-once caching semantics
    (video_upscaler.py:350-364) with the extra converted-weights stage."""
    if name not in MODEL_ZOO:
        raise ValueError(f"Unknown model: {name}")  # video_upscaler.py:322-323
    entry = MODEL_ZOO[name]
    mdir = Path(models_dir)
    npz_path = mdir / f"{name}.npz"
    pth_path = mdir / entry.pth_name

    if npz_path.exists():
        params = load_params_npz(name, npz_path)
        return ModelHandle(name, entry.spec, params).cast(dtype)

    if not pth_path.exists() and allow_download:
        mdir.mkdir(parents=True, exist_ok=True)
        try:
            _download(entry.url, pth_path)
        except Exception as e:  # zero-egress environments
            if allow_random:
                return random_model(name, seed, dtype)
            raise RuntimeError(
                f"Could not download {name} weights ({e}). Place "
                f"{entry.pth_name} in {mdir}/ manually, or pass "
                f"allow_random=True for random weights."
            ) from e

    if pth_path.exists():
        from video_restore_tpu.models.convert import convert_pth_to_params

        params = convert_pth_to_params(pth_path, name)
        mdir.mkdir(parents=True, exist_ok=True)
        save_params_npz(params, npz_path)
        return ModelHandle(name, entry.spec, params).cast(dtype)

    if allow_random:
        return random_model(name, seed, dtype)
    raise FileNotFoundError(f"No weights for {name} under {mdir}")

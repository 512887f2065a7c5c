"""Ahead-of-time export of compiled restore programs (jax.export / StableHLO).

The reference has no deployment story beyond "run the research script"
(SURVEY.md §0); a production TPU serving stack wants the opposite: compile the
whole restoration trajectory ONCE, serialize the artifact, and load it in a
serving process that carries no model-definition code (and, with
cross-platform lowering, was not even built on the target hardware).

``jax.export`` serializes the jitted function to versioned StableHLO with a
stable calling convention:

  * ``export_restore`` — lower the runner's whole-batch restore program
    (the same single-``lax.scan`` trajectory ``Runner.restore_batch`` runs)
    for fixed shapes and serialize it to bytes.
  * ``save_bundle`` / ``load_bundle`` — directory artifact holding the
    serialized program plus the model parameters (npz) and the input-shape
    manifest; ``load_bundle`` returns a plain callable
    ``(y, kernel, mask, seed) -> restored`` backed by the deserialized
    program — no UNet/Flax/sampler imports needed at serving time.

Notes
-----
* Parameters stay *arguments* of the exported program (not baked-in
  constants) so one artifact serves checkpoint refreshes without re-export.
* ``platforms=("tpu", "cpu")`` cross-lowers: the artifact can be produced on
  a CPU build box and executed on TPU serving hosts (or unit-tested on CPU).
* Exported programs are fixed-shape by design — the serving layer's
  fixed-shape batching (``serve.RestorationService``) is exactly the shape
  discipline the artifact needs.
* Mesh-sharded runners export mesh bundles: the program is captured with its
  real placements (batch over 'data', params with their Megatron-TP specs),
  so the artifact contains the partitioned computation *and* the ICI
  collectives; the manifest records the mesh geometry + per-leaf specs and
  ``load_bundle`` rebuilds them on the serving host's devices.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional, Sequence

import jax
import numpy as np
from jax import export as jexport
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from diffpir_tpu.runner import Runner

__all__ = ["export_restore", "save_bundle", "load_bundle", "LoadedRestore"]

_MANIFEST = "manifest.json"
_PROGRAM = "restore.stablehlo.bin"
_PARAMS = "params.npz"
# native-executable sidecar (jax.experimental.serialize_executable): written
# by LoadedRestore.save_aot() on the serving host, keyed by backend platform.
# Unlike the portable StableHLO program (which still pays a backend compile on
# first call in every fresh process), the sidecar restores a ready-to-run
# PJRT executable — process boot skips XLA entirely.
_AOT = "aot.{platform}.bin"


def _spec_to_json(spec) -> list:
    """PartitionSpec -> JSON list (axis name, list of names, or null)."""
    return [list(e) if isinstance(e, tuple) else e for e in tuple(spec)]


def _spec_from_json(lst) -> P:
    return P(*[tuple(e) if isinstance(e, list) else e for e in lst])


def _mesh_manifest(runner: Runner, flat) -> Optional[dict]:
    """Mesh geometry + per-leaf param specs (None for single-device runners)."""
    mesh = runner.mesh
    if mesh is None:
        return None
    return dict(
        axis_names=list(mesh.axis_names),
        shape=[int(mesh.shape[a]) for a in mesh.axis_names],
        param_specs=[_spec_to_json(x.sharding.spec) for x in flat],
    )


def _data_spec(ndim: int) -> P:
    return P("data", *([None] * (ndim - 1)))


def _example_structs(runner: Runner, *, batch: int, height: int, width: int,
                     kernel_hw: tuple[int, int] = (1, 1)):
    """ShapeDtypeStructs for (y, kernel, mask, key) at the given geometry.

    ``y`` is the degraded observation (LR for SR: height/width here are the
    *observation* dims); ``mask`` lives at the restored resolution
    (``Runner.restore_batch`` conventions).
    """
    cfg = runner.cfg
    C = cfg.n_channels
    sf = cfg.sf if cfg.task == "sr" else 1
    y = jax.ShapeDtypeStruct((batch, height, width, C), np.float32)
    kern = jax.ShapeDtypeStruct((batch,) + tuple(kernel_hw), np.float32)
    mask = jax.ShapeDtypeStruct((batch, height * sf, width * sf, C), np.float32)
    key = jax.ShapeDtypeStruct((2,), np.uint32)  # raw PRNGKey data
    return y, kern, mask, key


def export_restore(runner: Runner, *, batch: int, height: int, width: int,
                   kernel_hw: tuple[int, int] = (1, 1),
                   lambda_: Optional[float] = None,
                   zeta: Optional[float] = None,
                   dynamic_point: bool = False,
                   platforms: Sequence[str] = ("tpu", "cpu"),
                   allow_random_weights: bool = False) -> bytes:
    """Serialize the compiled whole-batch restore program to bytes.

    The exported calling convention is
    ``program(params, y, kernel, mask, key_data) -> restored`` with
    ``key_data`` the raw ``(2,)`` uint32 PRNGKey array.

    ``dynamic_point=True`` exports the program with two extra trailing
    arguments ``(lambda_vec, zeta_vec)`` — per-sample ``(batch,)`` float32
    operating points, exactly the live path's vector trace (the step tables
    are baked at lambda=1 and scaled in-graph; rho is linear in lambda).
    The artifact then serves any (even per-request-heterogeneous) operating
    point without re-export; ``lambda_``/``zeta`` become the manifest's
    recorded defaults.
    """
    cfg = runner.cfg
    if (getattr(runner, "weights_provenance", "random") == "random"
            and not allow_random_weights):
        # a shipped AOT bundle over the zoo's random-init fallback would
        # silently serve garbage forever; refuse unless explicitly a fixture
        raise RuntimeError(
            f"no trained weights found for model {cfg.model_name!r} — "
            f"refusing to export a random-weight bundle (pass "
            f"allow_random_weights=True for test fixtures)")
    lambda_ = cfg.lambda_ if lambda_ is None else lambda_
    zeta = cfg.zeta if zeta is None else zeta
    base = runner._restore_fn()

    # the exported calling convention takes params as a FLAT LIST of arrays
    # (matching the npz bundle layout) so the serving process never needs the
    # Flax param-tree structure; the treedef is baked in here as a static
    flat, treedef = jax.tree_util.tree_flatten(runner.params)

    if dynamic_point:
        plan = runner._plan(1.0, 0.0)  # scaled in-graph by lambda_vec

        def fn(params_flat, y, kern, mask, key_data, lam_vec, zet_vec):
            params = jax.tree_util.tree_unflatten(treedef, params_flat)
            out = base(params, y, kern, mask, key_data, None, plan,
                       zet_vec, lam_vec)
            return out[0] if isinstance(out, tuple) else out
    else:
        plan = runner._plan(lambda_, zeta)

        def fn(params_flat, y, kern, mask, key_data):
            params = jax.tree_util.tree_unflatten(treedef, params_flat)
            # key_data is a raw (2,) uint32 array == old-style PRNGKey.
            # plan/zeta/lambda baked as constants: this bundle ships ONE
            # fixed operating point (dynamic_point=False)
            out = base(params, y, kern, mask, key_data, None, plan, zeta,
                       lambda_)
            return out[0] if isinstance(out, tuple) else out

    structs = _example_structs(runner, batch=batch, height=height, width=width,
                               kernel_hw=kernel_hw)
    if dynamic_point:
        structs = structs + (
            jax.ShapeDtypeStruct((batch,), np.float32),
            jax.ShapeDtypeStruct((batch,), np.float32))
    if runner.mesh is not None:
        # record the real placements: params keep their (possibly Megatron-TP)
        # shardings, observations shard over the 'data' axis — the exported
        # program then contains the partitioned computation + collectives
        mesh = runner.mesh
        repl = NamedSharding(mesh, P())
        y_s, k_s, m_s, key_s = structs[:4]
        structs = (
            jax.ShapeDtypeStruct(y_s.shape, y_s.dtype,
                                 sharding=NamedSharding(mesh, _data_spec(4))),
            jax.ShapeDtypeStruct(k_s.shape, k_s.dtype,
                                 sharding=NamedSharding(mesh, _data_spec(3))),
            jax.ShapeDtypeStruct(m_s.shape, m_s.dtype,
                                 sharding=NamedSharding(mesh, _data_spec(4))),
            jax.ShapeDtypeStruct(key_s.shape, key_s.dtype, sharding=repl),
        ) + tuple(
            # per-sample (lambda, zeta) vectors ride the data axis with
            # their batch rows, as in Runner.restore_batch
            jax.ShapeDtypeStruct(s.shape, s.dtype,
                                 sharding=NamedSharding(mesh, _data_spec(1)))
            for s in structs[4:])
        flat_structs = [jax.ShapeDtypeStruct(np.shape(x), x.dtype,
                                             sharding=x.sharding)
                        for x in flat]
    else:
        flat_structs = [jax.ShapeDtypeStruct(np.shape(x), x.dtype)
                        for x in flat]
    exported = jexport.export(jax.jit(fn), platforms=list(platforms))(
        flat_structs, *structs)
    return exported.serialize()


def save_bundle(runner: Runner, path: str, *, batch: int, height: int,
                width: int, kernel_hw: tuple[int, int] = (1, 1),
                lambda_: Optional[float] = None, zeta: Optional[float] = None,
                dynamic_point: bool = False,
                platforms: Sequence[str] = ("tpu", "cpu"),
                allow_random_weights: bool = False) -> str:
    """Write a self-contained serving artifact directory.

    Contents: the serialized program, the parameters (flat npz, fp32/bf16 as
    bound), and a JSON manifest with the expected input shapes.
    """
    os.makedirs(path, exist_ok=True)
    blob = export_restore(runner, batch=batch, height=height, width=width,
                          kernel_hw=kernel_hw, lambda_=lambda_, zeta=zeta,
                          dynamic_point=dynamic_point, platforms=platforms,
                          allow_random_weights=allow_random_weights)
    with open(os.path.join(path, _PROGRAM), "wb") as f:
        f.write(blob)

    flat, treedef = jax.tree_util.tree_flatten(runner.params)
    np.savez(os.path.join(path, _PARAMS),
             **{str(i): np.asarray(v) for i, v in enumerate(flat)})
    cfg = runner.cfg
    manifest = dict(
        task=cfg.task, sf=cfg.sf if cfg.task == "sr" else 1,
        n_channels=cfg.n_channels, batch=batch, height=height, width=width,
        kernel_hw=list(kernel_hw), platforms=list(platforms),
        model_name=cfg.model_name, iter_num=cfg.iter_num,
        treedef=str(treedef),
        mesh=_mesh_manifest(runner, flat),
        dynamic_point=dynamic_point,
        lambda_=float(cfg.lambda_ if lambda_ is None else lambda_),
        zeta=float(cfg.zeta if zeta is None else zeta),
    )
    with open(os.path.join(path, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return path


class LoadedRestore:
    """A deserialized restore program bound to its parameters.

    Callable as ``loaded(y, kernel=None, mask=None, seed=0) -> np.ndarray``
    with host numpy arrays at exactly the manifest shapes.
    """

    def __init__(self, path: str, *, use_aot: bool = True):
        self._path = path
        # boot-phase breakdown (seconds) for cold-start accounting
        # (scripts/cold_start_probe.py); phases absent from a boot are absent
        # from the dict (e.g. no program_deserialize_s on an AOT-hit boot —
        # the StableHLO program is then only read lazily if ever needed).
        self.boot_timings: dict = {}
        t = time.perf_counter()
        with open(os.path.join(path, _MANIFEST)) as f:
            self.manifest = json.load(f)
        self.boot_timings["manifest_s"] = round(time.perf_counter() - t, 3)

        mesh_info = self.manifest.get("mesh")
        self._exported_obj = None
        self._aot = None
        if use_aot and mesh_info is None:
            p = os.path.join(path,
                             _AOT.format(platform=jax.default_backend()))
            if os.path.exists(p):
                try:
                    import pickle

                    from jax.experimental import serialize_executable as se

                    t = time.perf_counter()
                    with open(p, "rb") as f:
                        # single-device executable: pin to device 0 (the
                        # default binds ALL local devices and then expects
                        # per-device input shards)
                        self._aot = se.deserialize_and_load(
                            *pickle.load(f),
                            execution_devices=jax.devices()[:1])
                    self.boot_timings["aot_deserialize_s"] = round(
                        time.perf_counter() - t, 3)
                except Exception as e:  # stale/foreign sidecar — fall back
                    import warnings

                    warnings.warn(f"ignoring AOT sidecar {p}: {e!r}")
                    self._aot = None

        t = time.perf_counter()
        with np.load(os.path.join(path, _PARAMS)) as z:
            self._params_flat = [z[str(i)] for i in range(len(z.files))]
        self.boot_timings["params_load_s"] = round(time.perf_counter() - t, 3)

        if mesh_info is None:
            # the StableHLO program is NOT read here: on an AOT-hit boot the
            # executable services every call and the (multi-second at 553M)
            # jexport.deserialize would be pure waste; the _exported property
            # reads it on demand (AOT miss, save_aot, param re-export checks)
            self._call = None
            return
        # rebuild the recorded mesh geometry on this host's devices and wrap
        # the program with the original input shardings — callers still pass
        # plain host arrays
        shape = mesh_info["shape"]
        n = int(np.prod(shape))
        devices = jax.devices()
        if len(devices) < n:
            raise RuntimeError(
                f"bundle was exported for a {shape} mesh ({n} devices); "
                f"this host has {len(devices)}")
        mesh = Mesh(np.asarray(devices[:n]).reshape(shape),
                    tuple(mesh_info["axis_names"]))
        param_sh = [NamedSharding(mesh, _spec_from_json(s))
                    for s in mesh_info["param_specs"]]
        in_sh = (param_sh,
                 NamedSharding(mesh, _data_spec(4)),
                 NamedSharding(mesh, _data_spec(3)),
                 NamedSharding(mesh, _data_spec(4)),
                 NamedSharding(mesh, P()))
        if self.manifest.get("dynamic_point"):
            in_sh = in_sh + (NamedSharding(mesh, _data_spec(1)),
                             NamedSharding(mesh, _data_spec(1)))
        self._call = jax.jit(self._exported.call, in_shardings=in_sh)

    @property
    def _exported(self):
        """The deserialized StableHLO program, read lazily on first use."""
        if self._exported_obj is None:
            t = time.perf_counter()
            with open(os.path.join(self._path, _PROGRAM), "rb") as f:
                self._exported_obj = jexport.deserialize(f.read())
            self.boot_timings["program_deserialize_s"] = round(
                time.perf_counter() - t, 3)
        return self._exported_obj

    def _example_structs(self):
        """ShapeDtypeStructs matching this bundle's exact call convention."""
        m = self.manifest
        B, H, W, C = m["batch"], m["height"], m["width"], m["n_channels"]
        sf, (kh, kw) = m["sf"], m["kernel_hw"]
        flat = [jax.ShapeDtypeStruct(p.shape, p.dtype)
                for p in self._params_flat]
        args = (flat,
                jax.ShapeDtypeStruct((B, H, W, C), np.float32),
                jax.ShapeDtypeStruct((B, kh, kw), np.float32),
                jax.ShapeDtypeStruct((B, H * sf, W * sf, C), np.float32),
                jax.ShapeDtypeStruct((2,), np.uint32))
        if m.get("dynamic_point"):
            args = args + (jax.ShapeDtypeStruct((B,), np.float32),
                           jax.ShapeDtypeStruct((B,), np.float32))
        return args

    def save_aot(self, path: Optional[str] = None) -> str:
        """Compile for THIS host's backend and cache the native executable.

        One process pays the XLA compile once (e.g. at deploy/install time);
        every later ``load_bundle`` on the same platform boots straight into
        a ready PJRT executable.  Single-device bundles only — mesh bundles
        are device-topology-pinned and keep the StableHLO path.
        """
        import pickle

        from jax.experimental import serialize_executable as se

        if self.manifest.get("mesh"):
            raise ValueError("AOT sidecar is unsupported for mesh bundles")
        compiled = jax.jit(self._exported.call).lower(
            *self._example_structs()).compile()
        payload = se.serialize(compiled)
        out = os.path.join(path or self._path,
                           _AOT.format(platform=jax.default_backend()))
        with open(out, "wb") as f:
            pickle.dump(payload, f)
        self._aot = compiled
        return out

    def reload_params(self, path: Optional[str] = None) -> None:
        """Re-read ``params.npz`` (checkpoint refresh without re-export).

        ``path`` may point at another bundle directory or a bare npz whose
        flat layout matches this bundle's program."""
        p = os.path.join(path or self._path, _PARAMS)
        if not os.path.exists(p) and path and path.endswith(".npz"):
            p = path
        with np.load(p) as z:
            flat = [z[str(i)] for i in range(len(z.files))]
        if len(flat) != len(self._params_flat) or any(
                a.shape != b.shape for a, b in zip(flat, self._params_flat)):
            raise ValueError("params layout does not match the exported program")
        self._params_flat = flat

    def __call__(self, y: np.ndarray, kernel: Optional[np.ndarray] = None,
                 mask: Optional[np.ndarray] = None, seed: int = 0,
                 lambda_=None, zeta=None, fetch: bool = True) -> np.ndarray:
        """``lambda_``/``zeta`` (scalar or per-sample ``(batch,)``) are only
        accepted by bundles exported with ``dynamic_point=True``; they
        default to the operating point recorded in the manifest.
        ``fetch=False`` returns the (asynchronously dispatching) device array
        instead of blocking on a host copy — serving loops use it to overlap
        host prep of the next chunk with device compute."""
        m = self.manifest
        B, H, W, C = m["batch"], m["height"], m["width"], m["n_channels"]
        sf = m["sf"]
        if not m.get("dynamic_point") and (lambda_ is not None
                                           or zeta is not None):
            raise ValueError(
                "this bundle bakes its operating point (lambda="
                f"{m.get('lambda_')}, zeta={m.get('zeta')}); re-export with "
                "dynamic_point=True to choose (lambda, zeta) at call time")
        y = np.asarray(y, np.float32)
        if y.shape != (B, H, W, C):
            raise ValueError(f"y must be {(B, H, W, C)}, got {y.shape}")
        if kernel is None:
            # identity (delta) PSF — center at size//2 matches psf_to_otf's
            # roll convention, so the default is a no-op blur, not a box blur
            kh, kw = m["kernel_hw"]
            kernel = np.zeros((B, kh, kw), np.float32)
            kernel[:, kh // 2, kw // 2] = 1.0
        if mask is None:
            mask = np.ones((B, H * sf, W * sf, C), np.float32)
        key_data = np.asarray(jax.random.PRNGKey(seed), np.uint32)
        args = (self._params_flat, y, np.asarray(kernel, np.float32),
                np.asarray(mask, np.float32), key_data)
        if m.get("dynamic_point"):
            lam = m["lambda_"] if lambda_ is None else lambda_
            zet = m["zeta"] if zeta is None else zeta
            args = args + (
                np.broadcast_to(np.asarray(lam, np.float32), (B,)).copy(),
                np.broadcast_to(np.asarray(zet, np.float32), (B,)).copy())
        fn = self._aot
        if fn is None:
            if self._call is None:  # non-mesh StableHLO path, built lazily
                self._call = self._exported.call
            fn = self._call
        out = fn(*args)
        return np.asarray(out) if fetch else out


def load_bundle(path: str) -> LoadedRestore:
    """Load a ``save_bundle`` artifact; see ``LoadedRestore``."""
    return LoadedRestore(path)


def main(argv: Optional[list] = None) -> None:
    """CLI: produce a serving bundle from a task config.

    python -m diffpir_tpu.export --opt configs/deblur.yaml --out artifact/ \\
        --batch 8 --hw 256 256 --kernel 25 25 [--platforms tpu cpu] [--cpu]
    """
    import argparse

    from diffpir_tpu.config import load_config

    ap = argparse.ArgumentParser(description=main.__doc__.splitlines()[0])
    ap.add_argument("--opt", required=True, help="task YAML config")
    ap.add_argument("--out", required=True, help="bundle output directory")
    ap.add_argument("--batch", type=int, default=None,
                    help="batch size (default: config batch_size)")
    ap.add_argument("--hw", type=int, nargs=2, metavar=("H", "W"),
                    default=(256, 256), help="observation height width")
    ap.add_argument("--kernel", type=int, nargs=2, metavar=("KH", "KW"),
                    default=(1, 1), help="PSF shape baked into the program")
    ap.add_argument("--platforms", nargs="+", default=["tpu", "cpu"])
    ap.add_argument("--set", action="append", default=[], metavar="KEY=VALUE")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--dynamic-point", action="store_true",
                    help="export (lambda, zeta) as per-sample runtime "
                         "arguments instead of baking one operating point")
    ap.add_argument("--allow-random-weights", action="store_true",
                    help="permit exporting without a trained checkpoint "
                         "(test fixtures only)")
    ap.add_argument("--aot", action="store_true",
                    help="also compile for THIS host's backend and write the "
                         "native-executable sidecar (LoadedRestore.save_aot) "
                         "so serving processes boot without any XLA compile")
    args = ap.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/diffpir_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    overrides = {}
    for kv in args.set:
        k, _, v = kv.partition("=")
        try:
            v = json.loads(v)
        except json.JSONDecodeError:
            pass
        overrides[k] = v
    cfg = load_config(args.opt, overrides=overrides)
    runner = Runner(cfg)
    path = save_bundle(runner, args.out, batch=args.batch or cfg.batch_size,
                       height=args.hw[0], width=args.hw[1],
                       kernel_hw=tuple(args.kernel),
                       dynamic_point=args.dynamic_point,
                       platforms=tuple(args.platforms),
                       allow_random_weights=args.allow_random_weights)
    size = os.path.getsize(os.path.join(path, _PROGRAM))
    print(f"wrote {path} (program {size / 1e6:.2f} MB, "
          f"platforms {args.platforms})")
    if args.aot:
        import time as _time

        t0 = _time.perf_counter()
        out = LoadedRestore(path, use_aot=False).save_aot()
        print(f"wrote {out} ({os.path.getsize(out) / 1e6:.2f} MB, "
              f"compiled in {_time.perf_counter() - t0:.1f}s)")


if __name__ == "__main__":
    main()

"""Evaluation runner: dataset -> degrade -> restore -> metrics -> artifacts.

The L5 driver of the framework (reference analogue: ``main_ddpir.py:172-595``
``main``/``test_rho``).  One jitted restore function per task covers the whole
device-sharded batch; the sampling trajectory inside is a single ``lax.scan``
(``diffpir_tpu.sampler``), so each batch is exactly one XLA program launch.

Reference-parity details:
  * per-step tables built once per (lambda, zeta) setting (``main_ddpir.py:274-286``)
  * metrics: batched PSNR on [-1,1] with max_pixel=2, PSNR-Y via the BT.601
    luma combo, running averages in the log (``main_ddpir.py:482-535``)
  * the reference's hard-coded hyperparameter sweeps (``main_ddpir.py:548-580``)
    are exposed as ``reference_sweep`` — note the defaults it implies:
    deblur runs at (7*lambda, 3*zeta), SR sweeps lambda in {2..12}*lambda.
  * artifacts: restored PNGs (save_E), degraded inputs (save_L), .log file
    under ``results/<result_name>/``.
"""

from __future__ import annotations

import logging
import os
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from diffpir_tpu.config import TaskConfig
from diffpir_tpu.data import Batch, make_batches, prepare_images
from diffpir_tpu.models.zoo import resolve_model
from diffpir_tpu.ops.fft_prox import precompute
from diffpir_tpu.parallel.mesh import (make_mesh, replicate, shard_batch,
                                        shard_image)
from diffpir_tpu.sampler import (
    diffpir_sample, init_x, make_cubic_sr_prox, make_denoiser, make_fft_prox,
    make_inpaint_prox,
)
from diffpir_tpu.schedule import NoiseSchedule, build_plan
from diffpir_tpu.utils import image as im

__all__ = ["Runner", "reference_sweep", "setup_logger", "overlap_dispatch"]


def overlap_dispatch(items, dispatch, consume) -> None:
    """Double-buffered device/host overlap for the eval loop.

    Dispatches item i+1 to the device BEFORE host-consuming item i, so host
    work (metric computation, PNG writes) for one batch runs while the device
    computes the next (jax dispatch is asynchronous; the host only blocks at
    the fetch inside ``consume``).  ``dispatch(i, item) -> out`` must not
    block; ``consume(i, item, out, t_dispatch)`` fetches and post-processes.
    """
    import time as _time

    pending = None
    for i, item in enumerate(items):
        t0 = _time.perf_counter()
        out = dispatch(i, item)
        if pending is not None:
            consume(*pending)
        pending = (i, item, out, t0)
    if pending is not None:
        consume(*pending)

log = logging.getLogger("diffpir_tpu")


def setup_logger(name: str, log_path: Optional[str] = None) -> logging.Logger:
    """File+stream logger (reference ``utils/utils_logger.py:26-45``)."""
    lg = logging.getLogger(name)
    fmt = logging.Formatter("%(asctime)s.%(msecs)03d : %(message)s", "%y-%m-%d %H:%M:%S")
    if log_path:
        # add the file handler even if the logger already exists (e.g. a
        # prior evaluate(save=False) created it stream-only) — but never twice
        have = {getattr(h, "baseFilename", None) for h in lg.handlers}
        if os.path.abspath(log_path) not in have:
            os.makedirs(os.path.dirname(log_path), exist_ok=True)
            fh = logging.FileHandler(log_path, "a")
            fh.setFormatter(fmt)
            lg.addHandler(fh)
    if any(type(h) is logging.StreamHandler for h in lg.handlers):
        return lg
    lg.setLevel(logging.INFO)
    lg.propagate = False
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    lg.addHandler(sh)
    return lg


def reference_sweep(cfg: TaskConfig) -> list[tuple[float, float]]:
    """(lambda, zeta) settings the reference's main() actually runs
    (``main_ddpir.py:548-580``)."""
    if cfg.task == "sr":
        return [(cfg.lambda_ * i, cfg.zeta) for i in range(2, 13)]
    if cfg.task == "deblur":
        return [(cfg.lambda_ * 7, cfg.zeta * 3)]
    return [(cfg.lambda_, cfg.zeta)]


class Runner:
    """Bind config + model once; restore batches / run full evaluations."""

    def __init__(self, cfg: TaskConfig, *, use_mesh: bool = True,
                 abstract_params: bool = False):
        self.cfg = cfg
        self.schedule = NoiseSchedule.linear(
            cfg.beta_start, cfg.beta_end, cfg.num_train_timesteps)

        sigma_start = cfg.t_start_sigma
        self.t_start = (cfg.num_train_timesteps - 1 if sigma_start is None
                        else self.schedule.sigma_to_t(sigma_start))
        self.noise_model_t = (
            self.schedule.sigma_to_t(2 * cfg.noise_level_model)
            if cfg.skip_noise_model_t else 0)

        # deblur t_y init: y is treated as already noised to t_y
        # (main_ddpir_deblur.py:227-231; see sampler.init_x)
        self.ty_scale = None
        if cfg.task == "deblur" and cfg.ty_init:
            t_y = self.schedule.sigma_to_t(2 * cfg.noise_level_img)
            self.ty_scale = (
                float(self.schedule.sqrt_alphas_cumprod[t_y]),
                float(np.sqrt(1 - self.schedule.alphas_cumprod[t_y])))

        dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        self.module, params, self.weights_provenance = resolve_model(
            cfg.model_name, cfg.model_zoo, dtype=dtype,
            use_pallas=cfg.use_pallas, abstract=abstract_params)

        self.mesh = None
        self.mesh_axes: tuple[str, ...] = ()
        if use_mesh and len(jax.devices()) > 1:
            shape = None if cfg.mesh_shape is None else tuple(cfg.mesh_shape)
            if cfg.mesh_axes is not None:
                axes = tuple(cfg.mesh_axes)
            else:
                # legacy defaults: 1-D = dp, 2-D [D, M] = dp x Megatron TP
                axes = ("data",) if shape is None or len(shape) == 1 \
                    else ("data", "model")
            self.mesh = make_mesh(shape, axis_names=axes)
            self.mesh_axes = axes
            if "model" in axes:
                # Megatron-style parameter sharding over "model"
                # (parallel/tp.py) — the 553M imagenet flagship stops having
                # to fit one chip
                from jax.sharding import NamedSharding

                from diffpir_tpu.parallel.tp import (
                    shard_unet_params, unet_tp_specs)

                if abstract_params:
                    # attach shardings without materializing anything —
                    # lower_restore() validates propagation at full scale
                    specs = unet_tp_specs(params, self.module.cfg,
                                          self.mesh.shape["model"])
                    params = jax.tree_util.tree_map(
                        lambda p, s: jax.ShapeDtypeStruct(
                            p.shape, p.dtype,
                            sharding=NamedSharding(self.mesh, s)),
                        params, specs)
                else:
                    params = shard_unet_params(params, self.mesh,
                                               self.module.cfg)
            else:
                # dp and/or sp: params replicated; "space" shards
                # ACTIVATIONS on image height (parallel/mesh.py:shard_image)
                if abstract_params:
                    from jax.sharding import NamedSharding, PartitionSpec

                    rep = NamedSharding(self.mesh, PartitionSpec())
                    params = jax.tree_util.tree_map(
                        lambda p: jax.ShapeDtypeStruct(p.shape, p.dtype,
                                                       sharding=rep),
                        params)
                else:
                    params = replicate(params, self.mesh)
        self.params = params

        self._apply = lambda p, x, t: self.module.apply({"params": p}, x, t)
        if cfg.test_mode:
            # wrap the denoiser in the reference's evaluation modes
            # (utils/utils_model.py:16-45): pad / recursive split / x8
            # ensemble for large or awkwardly-shaped inputs
            from diffpir_tpu import inference

            base_apply = self._apply
            depth_mod = 2 ** (len(self.module.cfg.channel_mult) - 1)

            def _apply_test_mode(p, x, t):
                t = jnp.broadcast_to(jnp.asarray(t, jnp.int32), (x.shape[0],))
                return inference.test_mode(
                    lambda v: base_apply(
                        p, v, jnp.full((v.shape[0],), t[0], jnp.int32)),
                    x, mode=cfg.test_mode, refield=32,
                    min_size=self.module.cfg.image_size, modulo=depth_mod)

            self._apply = _apply_test_mode
        self.den = make_denoiser(
            self._apply, params, self.schedule, compute_dtype=dtype)
        from diffpir_tpu.diffusion import Diffusion, ModelMeanType, ModelVarType

        self.diffusion = Diffusion(self.schedule, ModelMeanType.EPSILON,
                                   ModelVarType.LEARNED_RANGE)
        self._restore_jit = {}

    # ------------------------------------------------------------------
    def _plan(self, lambda_: float, zeta: float):
        # the reference uses the cumulative sigma-bar ONLY for
        # (pred_xstart & DiffPIR); every other mode (pred_x_prev, DPS_*,
        # repaint, vanilla) weights rho with sigma_k = sqrt(beta/alpha)
        # (main_ddpir.py:279-284)
        rho_mode = ("xstart"
                    if (self.cfg.model_output_type == "pred_xstart"
                        and self.cfg.generate_mode == "DiffPIR")
                    else "xprev")
        return build_plan(
            self.schedule, iter_num=self.cfg.iter_num, skip_type=self.cfg.skip_type,
            lambda_=lambda_, eta=self.cfg.eta, sigma_y=self.cfg.sigma,
            t_start=self.t_start, noise_model_t=self.noise_model_t,
            rho_mode=rho_mode)

    def _restore_fn(self):
        """Build the jitted whole-batch restore function for the current task.

        ``plan`` (the lambda/zeta-derived per-step tables), ``zeta`` and
        ``lambda_`` are RUNTIME arguments, not closed-over constants: their
        shapes are sweep-invariant, so one compiled program serves every
        (lambda, zeta) point of ``--sweep`` / ``restore_batch`` — previously
        each sweep value baked new constants and forced a full recompile
        (~15 min/point through the axon tunnel).
        """
        cfg = self.cfg
        task = cfg.task
        sa0 = float(self.schedule.sqrt_alphas_cumprod[self.t_start])
        s1m0 = float(np.sqrt(1 - self.schedule.alphas_cumprod[self.t_start]))

        def model_fn_with(params):
            return lambda xv, tv: self._apply(
                params, xv.astype(self.den.compute_dtype), tv)

        def restore(params, y, kernel, mask, key, init, plan, zeta, lambda_):
            import dataclasses as _dc

            from diffpir_tpu.guidance import (
                dps_sample, make_degrade_op, make_grad_prox)

            den = _dc.replace(self.den, params=params)
            k_init, k_samp = jax.random.split(key)
            if init is not None:
                # host-prepared init override (SR classical: shifted upscale,
                # main_ddpir_sisr.py:243-248), diffused to t_start
                noise = jax.random.normal(k_init, init.shape, jnp.float32)
                x = sa0 * (2.0 * init - 1.0) + s1m0 * noise
            else:
                x = init_x(task, y, mask, cfg.sf,
                           sqrt_acp_start=sa0, sqrt_1m_acp_start=s1m0,
                           key=k_init, ty=self.ty_scale)
            hr_hw = (y.shape[1] * cfg.sf, y.shape[2] * cfg.sf)
            # per-sample operating points: lambda (B,) means the plan was
            # built with lambda=1 and rho is scaled in-graph (restore_batch
            # arranges this); ndim is static at trace time
            lam_scale = lambda_ if jnp.ndim(lambda_) == 1 else None

            if cfg.model_output_type == "pred_x_prev":
                from diffpir_tpu.sampler import xprev_sample

                # inpaint: per-step masked-average prox on the sampled x;
                # deblur/sr: the reference applies NO data term in this mode
                # (its analytic branch is inpaint-only, main_ddpir.py:414 —
                # deblur/sr run the plain ancestral chain)
                inpaint = task == "inpaint"
                return xprev_sample(
                    self.diffusion, model_fn_with(params), plan, x, k_samp,
                    y=y if inpaint else None, mask=mask if inpaint else None,
                    ddim=cfg.ddim_sample,
                    recover_known=cfg.recover_known, lam_scale=lam_scale)

            if cfg.generate_mode in ("DPS_y0", "DPS_yt"):
                op = make_degrade_op(task, kernel=kernel, hr_hw=hr_hw, sf=cfg.sf)
                # lambda must be the SAME value the plan's rho was built with
                # (the reference mutates config.lambda_ before test_rho, so the
                # factor cancels exactly in the DPS_yt step, main_ddpir.py:443)
                return dps_sample(
                    self.diffusion, model_fn_with(params), op, plan, x, k_samp,
                    mode=cfg.generate_mode, task=task, y=y, lambda_=lambda_)

            if not cfg.sub_1_analytic and task in ("deblur", "sr"):
                op = make_degrade_op(task, kernel=kernel, hr_hw=hr_hw, sf=cfg.sf)
                meas = y if task == "deblur" else 2.0 * y - 1.0
                prox = make_grad_prox(op, meas)
            elif task == "inpaint":
                prox = make_inpaint_prox(y, mask, cfg.guidance_scale)
            elif task == "deblur" or (task == "sr"
                                      and cfg.sr_mode in ("blur", "classical")):
                prox = make_fft_prox(precompute(y, kernel, cfg.sf), cfg.guidance_scale)
            else:  # sr cubic
                prox = make_cubic_sr_prox(
                    y, cfg.sf, gamma=cfg.gamma, in_iter=cfg.inIter, hr_hw=hr_hw)
            from diffpir_tpu.schedule import make_progress_slots

            slots = make_progress_slots(plan.n_steps) if cfg.log_process else None
            return diffpir_sample(
                den, prox, plan, x, k_samp, zeta=zeta,
                iter_num_U=cfg.iter_num_U, generate_mode=cfg.generate_mode,
                y=y, mask=mask, progress_slots=slots,
                recover_known=(task == "inpaint" and cfg.recover_known),
                lam_scale=lam_scale)

        return jax.jit(restore)

    def lower_restore(self, batch: int, height: int, width: int,
                      kernel_hw: tuple[int, int] = (1, 1)):
        """Trace + lower the whole restore trajectory WITHOUT executing it.

        Shapes only: works with ``abstract_params=True`` Runners, so the
        553M flagship's dp x tp sharding propagation can be validated on any
        host (e.g. a virtual CPU mesh) without 553M of memory or a compile.
        Returns the ``jax.stages.Lowered`` — ``.as_text()`` is the sharded
        StableHLO.  ``height``/``width`` are the observation's size (for SR,
        the low-res input).
        """
        from jax.sharding import NamedSharding, PartitionSpec

        cfg = self.cfg
        plan = self._plan(cfg.lambda_, cfg.zeta)
        fn = self._restore_fn()
        img_sh = kern_sh = None
        if self.mesh is not None:
            d = "data" if "data" in self.mesh_axes else None
            s = "space" if "space" in self.mesh_axes else None
            img_sh = NamedSharding(self.mesh, PartitionSpec(d, s))
            kern_sh = NamedSharding(self.mesh, PartitionSpec(d))

        def arg(shape, sh):
            return jax.ShapeDtypeStruct(shape, jnp.float32, sharding=sh)

        y = arg((batch, height, width, cfg.n_channels), img_sh)
        kern = arg((batch,) + tuple(kernel_hw), kern_sh)
        mask = arg((batch, height, width, cfg.n_channels), img_sh)
        return fn.lower(self.params, y, kern, mask,
                        jax.random.PRNGKey(0), None, plan,
                        cfg.zeta, cfg.lambda_)

    def restore_batch(self, batch: Batch, lambda_: Optional[float] = None,
                      zeta: Optional[float] = None, seed: int = 0,
                      fetch: bool = True) -> np.ndarray:
        """Restore one batch; returns float [0,1] (B,H,W,C).

        fetch=False returns the (asynchronously dispatching) device arrays
        without blocking — the eval loop uses this to overlap host work for
        batch i with device compute for batch i+1.
        """
        cfg = self.cfg
        if self.weights_provenance == "abstract":
            raise RuntimeError(
                "Runner was built with abstract_params=True (no weights "
                "materialized) — only lower_restore() is available")
        lambda_ = cfg.lambda_ if lambda_ is None else lambda_
        zeta = cfg.zeta if zeta is None else zeta
        # one jitted program per Runner: lambda/zeta ride in as runtime
        # arguments (plan tables + scalars), so a sweep never recompiles —
        # jit itself retraces on new SHAPES (batch size, image size) only.
        # Either may also be PER-SAMPLE (length-B sequence): one launch then
        # carries heterogeneous operating points (rho is linear in lambda, so
        # the plan is built at lambda=1 and scaled in-graph); the vector form
        # is a second (also sweep-stable) trace.
        if not self._restore_jit:
            self._restore_jit["fn"] = self._restore_fn()
        fn = self._restore_jit["fn"]
        lam_arr = np.asarray(lambda_, np.float32)
        zeta_arr = np.asarray(zeta, np.float32)
        if lam_arr.ndim == 1 or zeta_arr.ndim == 1:
            B = batch.img_L.shape[0]
            lambda_ = np.broadcast_to(lam_arr, (B,)).astype(np.float32)
            zeta = np.broadcast_to(zeta_arr, (B,)).astype(np.float32)
            plan = self._plan(1.0, 0.0)
        else:
            plan = self._plan(float(lam_arr), float(zeta_arr))

        y = jnp.asarray(batch.img_L)
        kern = jnp.asarray(batch.kernel)
        mask = jnp.asarray(batch.mask)
        init = None if batch.init is None else jnp.asarray(batch.init)
        if self.mesh is not None and jax.process_count() > 1:
            # multi-process (DCN) cluster: ``batch`` is this PROCESS's shard
            # (train.datasets-style per-host input sharding, the reference's
            # MPI-rank chunking in dist_util.py:21-74); assemble the logical
            # global arrays over the mesh.  Data-parallel only across
            # processes — "space"/"model" axes stay intra-process.
            from diffpir_tpu.parallel.multihost import globalize_batch

            y = globalize_batch(np.asarray(batch.img_L, np.float32), self.mesh)
            mask = globalize_batch(np.asarray(batch.mask, np.float32), self.mesh)
            kern = globalize_batch(np.asarray(batch.kernel, np.float32), self.mesh)
            if init is not None:
                init = globalize_batch(np.asarray(batch.init, np.float32),
                                       self.mesh)
            if np.ndim(lambda_) == 1:
                lambda_ = globalize_batch(np.asarray(lambda_, np.float32),
                                          self.mesh)
                zeta = globalize_batch(np.asarray(zeta, np.float32), self.mesh)
        elif self.mesh is not None:
            d = "data" if "data" in self.mesh_axes else None
            s = "space" if "space" in self.mesh_axes else None
            y = shard_image(y, self.mesh, d, s)
            mask = shard_image(mask, self.mesh, d, s)
            # PSF kernels are tiny: batch-sharded only, never spatially
            kern = shard_batch(kern, self.mesh, d)
            if init is not None:
                init = shard_image(init, self.mesh, d, s)
            if np.ndim(lambda_) == 1:
                # per-sample operating points ride with their batch rows
                lambda_ = shard_batch(jnp.asarray(lambda_), self.mesh, d)
                zeta = shard_batch(jnp.asarray(zeta), self.mesh, d)
        out = fn(self.params, y, kern, mask, jax.random.PRNGKey(seed), init,
                 plan, zeta, lambda_)
        if not fetch:
            return out

        def _get(o):
            if getattr(o, "is_fully_addressable", True):
                return np.asarray(jax.device_get(o))
            # spans other processes' devices: allgather the shards over DCN
            from diffpir_tpu.parallel.multihost import fetch_global

            return fetch_global(o)

        if isinstance(out, tuple):  # (restored, progress frames)
            return tuple(_get(o) for o in out)
        return _get(out)

    # ------------------------------------------------------------------
    def evaluate(self, lambda_: Optional[float] = None,
                 zeta: Optional[float] = None,
                 paths: Optional[list[str]] = None,
                 save: Optional[bool] = None,
                 hole_metrics: bool = False) -> dict:
        """Full test-set evaluation with reference-parity metrics and logging.

        ``hole_metrics=True`` (inpainting) additionally reports
        ``psnr_hole``/``ssim_hole`` — PSNR/SSIM restricted to the masked-out
        (mask == 0) pixels.  With ``recover_known`` the observed pixels are
        pasted exactly, so the full-image numbers only dilute the hole error
        by the mask ratio (a 128px box on 256px saturates them ~6 dB high);
        the reference avoids this by publishing box-inpaint FID/LPIPS and no
        PSNR at all (``README.md:137-138``) — the hole metrics measure what
        the model actually painted, at any mask size."""
        cfg = self.cfg
        lambda_ = cfg.lambda_ if lambda_ is None else lambda_
        zeta = cfg.zeta if zeta is None else zeta
        save = (cfg.save_E or cfg.save_L) if save is None else save
        lg = setup_logger(cfg.result_name,
                          os.path.join(cfg.E_path, cfg.result_name + ".log")
                          if save else None)
        lg.info(f"eta:{cfg.eta}, zeta:{zeta}, lambda:{lambda_}, "
                f"guidance_scale:{cfg.guidance_scale}")

        np.random.seed(cfg.seed)
        items = prepare_images(cfg, paths)
        if not items:
            raise FileNotFoundError(
                f"no images found under {cfg.L_path!r} (testset_name="
                f"{cfg.testset_name!r})")
        batches = make_batches(items, cfg.batch_size,
                               pad_to_batch=self.mesh is not None)
        lpips_fn = None
        if cfg.calc_LPIPS:
            from diffpir_tpu.metrics import make_lpips

            lpips_fn = make_lpips(weights_path=cfg.lpips_weights)
        fid = None
        if cfg.calc_FID:
            # set-level metric (the reference's tables report it but never
            # compute it): accumulate InceptionV3-pool3 features per batch,
            # one Fréchet distance at the end
            if not cfg.fid_weights:
                raise ValueError("calc_FID requires fid_weights (local "
                                 "InceptionV3 weights; metrics.FidScorer)")
            from diffpir_tpu.metrics import FidScorer

            fid = FidScorer(cfg.fid_weights)

        psnrs, psnrs_y, ssims, lpipss, times, n_imgs = [], [], [], [], [], 0
        psnrs_hole, ssims_hole = [], []
        if save and cfg.task == "inpaint" and cfg.save_progressive_mask and batches:
            im.imsave_batch(batches[0].mask, batches[0].names, cfg.E_path, "mask_")

        def consume(bi: int, batch: Batch, out, t0: float) -> None:
            """Host-fetch + metrics + artifact IO for a dispatched batch."""
            nonlocal n_imgs
            frames = None
            if isinstance(out, tuple):
                out, frames = out
                frames = np.asarray(jax.device_get(frames))
            x0 = np.asarray(jax.device_get(out))
            times.append(time.perf_counter() - t0)
            nb = len(batch.names)
            x0 = x0[:nb]
            gt = batch.img_H[:nb].astype(np.float32) / 255.0

            psnr = im.psnr_batch(x0 * 2 - 1, gt * 2 - 1)
            psnrs.append(psnr * nb)
            E_uint = im.single2uint(x0)
            if cfg.n_channels == 3:
                if cfg.psnr_y_mode == "true":
                    # honest per-image uint8 Y-channel PSNR
                    # (main_ddpir_sisr.py:458-462)
                    psnr_y = float(np.mean([
                        im.psnr(im.rgb_to_y(E_uint[j]), im.rgb_to_y(batch.img_H[j]))
                        for j in range(nb)]))
                else:
                    # reference metric composition: PSNR over a 3-channel
                    # tensor whose Cb/Cr are zeros (utils_image.py:482-484
                    # fills only channel 0), i.e. logged PSNR-Y =
                    # true Y-PSNR + 10*log10(3)
                    def y3(v):
                        yc = im.rgb_to_y_batch(v)
                        return np.concatenate([yc, np.zeros_like(yc),
                                               np.zeros_like(yc)], axis=-1)

                    psnr_y = im.psnr_batch(y3(x0 * 2 - 1), y3(gt * 2 - 1))
                psnrs_y.append(psnr_y * nb)
            msg = f"batch{bi + 1:->4d}--> PSNR: {psnr:.4f}dB"
            if hole_metrics:
                hole = 1.0 - batch.mask[:nb, :, :, 0]  # (nb, H, W), 1 = hole
                ph = float(np.mean([
                    im.psnr_region(x0[j] * 2 - 1, gt[j] * 2 - 1,
                                   hole[j][:, :, None]) for j in range(nb)]))
                sh = float(np.mean([
                    im.ssim(E_uint[j], batch.img_H[j], region=hole[j])
                    for j in range(nb)]))
                psnrs_hole.append(ph * nb)
                ssims_hole.append(sh * nb)
                msg += f"; hole PSNR: {ph:.4f}dB SSIM: {sh:.4f}"
            if cfg.calc_SSIM:
                sv = float(np.mean([im.ssim(E_uint[j], batch.img_H[j])
                                    for j in range(nb)]))
                ssims.append(sv * nb)
                msg += f"; SSIM: {sv:.4f}"
            if lpips_fn is not None:
                lp = lpips_fn(x0 * 2 - 1, gt * 2 - 1)
                lpipss.append(lp * nb)
                msg += f"; LPIPS: {lp:.4f}"
            if fid is not None:
                fid.add(x0, gt)
            n_imgs += nb
            lg.info(msg + f" ({nb} imgs, {times[-1]:.2f}s)")
            if save and frames is not None:
                # progressive strip: snapshots concatenated horizontally
                # (reference main_ddpir_sisr.py:426-432)
                strips = np.concatenate(list(frames[:, :nb]), axis=2)
                im.imsave_batch(strips, batch.names, cfg.E_path, "progress_")
            if save and cfg.save_E:
                im.imsave_batch(
                    x0, batch.names, cfg.E_path,
                    f"{cfg.model_name}_x{cfg.sf}_lambda{lambda_:.4f}_zeta{zeta:.4f}_")
            if save and cfg.save_L:
                im.imsave_batch(batch.img_L[:nb], batch.names, cfg.E_path,
                                f"LR_x{cfg.sf}_")
            if save and cfg.task == "deblur":
                # per-image kernel visualization (main_ddpir_deblur.py:177:
                # k * 255 * 200, clipped by the uint8 save)
                for j in range(nb):
                    kv = np.clip(batch.kernel[j] * 255.0 * 200.0, 0, 255)
                    im.imsave(kv.round().astype(np.uint8),
                              os.path.join(cfg.E_path,
                                           f"motion_kernel_{batch.names[j]}"))
            if save and cfg.save_LEH:
                # L (nearest-upscaled to HR, original L + kernel viz inset in
                # the corners) | E | H montage (main_ddpir_sisr.py:440-451)
                L_up = np.repeat(np.repeat(batch.img_L[:nb], cfg.sf, axis=1),
                                 cfg.sf, axis=2).copy()
                hl, wl = batch.img_L.shape[1:3]
                for j in range(nb):
                    k = batch.kernel[j]
                    if k.size > 1:
                        kv = np.repeat(np.repeat(k / max(k.max(), 1e-12), 3,
                                                 axis=0), 3, axis=1)
                        kh = min(kv.shape[0], L_up.shape[1])
                        kw = min(kv.shape[1], L_up.shape[2])
                        L_up[j, :kh, -kw:, :] = kv[:kh, :kw, None]
                    L_up[j, :hl, :wl] = batch.img_L[j]
                montage = np.concatenate([L_up, x0, gt], axis=2)
                im.imsave_batch(montage, batch.names, cfg.E_path, "LEH_")

        t_wall0 = time.perf_counter()
        overlap_dispatch(
            batches,
            lambda bi, b: self.restore_batch(b, lambda_, zeta,
                                             seed=cfg.seed + bi, fetch=False),
            consume)
        wall = time.perf_counter() - t_wall0

        results = {
            "psnr": sum(psnrs) / n_imgs,
            "psnr_y": sum(psnrs_y) / n_imgs if psnrs_y else None,
            "ssim": sum(ssims) / n_imgs if ssims else None,
            "lpips": sum(lpipss) / n_imgs if lpipss else None,
            "fid": fid.score() if fid is not None else None,
            "psnr_hole": sum(psnrs_hole) / n_imgs if psnrs_hole else None,
            "ssim_hole": sum(ssims_hole) / n_imgs if ssims_hole else None,
            "n_images": n_imgs,
            "images_per_sec": n_imgs / wall if wall > 0 else 0.0,
            "lambda_": lambda_, "zeta": zeta,
        }
        msg = (f"-----------> Average PSNR(RGB) of ({cfg.testset_name}): "
               f"{results['psnr']:.4f} dB")
        if results["ssim"] is not None:
            msg += f" | SSIM: {results['ssim']:.4f}"
        if results["fid"] is not None:
            msg += f" | FID: {results['fid']:.2f}"
        if results["psnr_hole"] is not None:
            msg += (f" | hole PSNR: {results['psnr_hole']:.4f} dB "
                    f"SSIM: {results['ssim_hole']:.4f}")
        lg.info(msg + f" | {results['images_per_sec']:.3f} img/s")
        return results

    def evaluate_sweep(self, **kw) -> list[dict]:
        return [self.evaluate(lambda_=l, zeta=z, **kw)
                for l, z in reference_sweep(self.cfg)]

    def tune_operating_point(self, points, *, batch: Optional[Batch] = None,
                             paths: Optional[list[str]] = None,
                             index: int = 0, indices=None,
                             seed: Optional[int] = None) -> dict:
        """Autotune (lambda, zeta) on one or more observations, one launch each.

        Replicates one degraded observation ``len(points)`` times and
        restores the replicas with a PER-SAMPLE (lambda, zeta) vector, so the
        whole candidate grid costs one device launch through one compiled
        program (the sweep-stable vector trace of ``restore_batch``).  With
        ``indices=(i0, i1, ...)`` the same compiled program is re-launched
        once per image (identical shapes -> no recompile) and candidates are
        ranked by MEAN PSNR across the images — a few launches de-risk the
        single-image tune overfitting its one observation.  The reference
        explores operating points only by re-running its entire driver per
        value (``main_ddpir.py:548-580`` mutates the config and calls
        ``test_rho`` once per sweep point).

        Args:
          points: sequence of ``(lambda, zeta)`` candidates; ``zeta=None``
            means the config default.
          batch: optional Batch whose row 0 is the observation to tune on;
            when absent the observation is taken from the configured test
            set (``paths``/``index``/``indices`` pick the image(s)).
          indices: optional sequence of test-set indices to average over
            (overrides ``index``; incompatible with ``batch``).
          seed: PRNG base seed (default ``cfg.seed``); launch k uses seed+k.
            Within a launch all replicas share one batch key, so candidates
            differ only in their operating point.

        Returns ``{"results": [...], "best": {...}, "output": (H,W,C)}`` —
        per-candidate mean PSNR (and SSIM when ``cfg.calc_SSIM``) vs the
        ground truth in input order, the best row, and the best candidate's
        restore of the first tuned image.
        """
        cfg = self.cfg
        pts = [(float(l), cfg.zeta if z is None else float(z))
               for l, z in points]
        if not pts:
            raise ValueError("points must be non-empty")
        if batch is not None:
            if indices is not None:
                raise ValueError("pass either batch or indices, not both")
            batches = [batch]
        else:
            np.random.seed(cfg.seed)
            items = prepare_images(cfg, paths)
            idxs = list(indices) if indices is not None else [index]
            if not idxs:
                raise ValueError("indices must be non-empty (need at least "
                                 "one image to tune on)")
            for i in idxs:
                if i >= len(items):
                    raise IndexError(f"index {i} >= {len(items)} test images")
            batches = [make_batches([items[i]], 1)[0] for i in idxs]
        P = len(pts)
        n = P
        if self.mesh is not None and "data" in self.mesh_axes:
            d = self.mesh.shape["data"]
            n = ((P + d - 1) // d) * d  # pad rows to shard evenly
        lams = np.array([l for l, _ in pts] + [pts[-1][0]] * (n - P),
                        np.float32)
        zets = np.array([z for _, z in pts] + [pts[-1][1]] * (n - P),
                        np.float32)
        base_seed = cfg.seed if seed is None else seed
        psnr_acc = np.zeros(P, np.float64)
        ssim_acc = np.zeros(P, np.float64)
        first_out = None
        for k, b in enumerate(batches):
            rep = lambda a: None if a is None else np.repeat(a[:1], n, axis=0)
            grid = Batch(img_H=rep(b.img_H), img_L=rep(b.img_L),
                         kernel=rep(b.kernel), mask=rep(b.mask),
                         names=[b.names[0]] * n, init=rep(b.init))
            out = self.restore_batch(grid, lambda_=lams, zeta=zets,
                                     seed=base_seed + k)
            if isinstance(out, tuple):  # drop progress frames if configured
                out = out[0]
            if first_out is None:
                first_out = out
            gt = b.img_H[0].astype(np.float32) / 255.0
            for i in range(P):
                psnr_acc[i] += float(im.psnr_batch(out[i:i + 1] * 2 - 1,
                                                   gt[None] * 2 - 1))
                if cfg.calc_SSIM:
                    ssim_acc[i] += float(im.ssim(im.single2uint(out[i]),
                                                 b.img_H[0]))
        results = []
        for i, (lam, zet) in enumerate(pts):
            row = {"lambda_": lam, "zeta": zet,
                   "psnr": float(psnr_acc[i] / len(batches))}
            if cfg.calc_SSIM:
                row["ssim"] = float(ssim_acc[i] / len(batches))
            results.append(row)
        best_i = int(np.argmax([r["psnr"] for r in results]))
        return {"results": results, "best": results[best_i],
                "output": first_out[best_i]}


def dryrun_restore(n_devices: int) -> None:
    """Compile + execute mesh-sharded inference on tiny shapes.

    The multi-chip *inference* half of the driver gate (the headline
    capability per BASELINE.json): an ``n_devices``-wide data-parallel mesh,
    batch sharded over the 'data' axis, replicated params, whole trajectory as
    one ``lax.scan``.  Covers all three prox families — mask-average inpaint,
    sf=1 FFT Wiener deblur, and sf-split Wiener SR
    (reference ``main_ddpir.py:384-445``) — each ALSO on the dp x tp 2-D mesh
    with Megatron-style parameter sharding (checked against the dp result),
    then two deployment stages on the same virtual mesh: an exported
    StableHLO mesh bundle (save_bundle -> load_bundle -> execute) and one
    ``RestorationService.submit`` coalescing round.
    """
    from diffpir_tpu.config import load_config

    assert len(jax.devices()) >= n_devices, (
        f"need {n_devices} devices, have {len(jax.devices())}")
    rng = np.random.default_rng(0)
    H = 64
    img_H = rng.integers(0, 256, (n_devices, H, H, 3)).astype(np.uint8)
    k1 = np.zeros((7, 7), np.float32)
    k1[3, 3] = 1.0  # identity PSF — shape-realistic, numerically tame

    for task in ("inpaint", "deblur", "sr"):
        cfg = load_config(None, overrides=dict(
            task=task, model_name="tiny_test", iter_num=2, iter_num_U=1,
            batch_size=n_devices, noise_level_img=0.0, seed=0,
            dtype="float32", save_L=False, save_E=False,
            mesh_shape=(n_devices,),
            **(dict(sf=2, sr_mode="blur") if task == "sr" else {})))
        runner = Runner(cfg, use_mesh=True)
        assert runner.mesh is not None, "mesh construction failed"
        mask = np.ones(img_H.shape, np.float32)
        kernel = np.broadcast_to(k1, (n_devices, 7, 7)).copy()
        if task == "inpaint":
            mask = (rng.uniform(size=img_H.shape) > 0.5).astype(np.float32)
            img_L = img_H.astype(np.float32) * mask / 255.0
            kernel = np.ones((n_devices, 1, 1), np.float32)
        elif task == "deblur":
            img_L = img_H.astype(np.float32) / 255.0
        else:  # sr: low-res observation, restored at H = h * sf
            img_L = (img_H.astype(np.float32) / 255.0)[:, ::2, ::2]
        batch = Batch(img_H=img_H, img_L=img_L.astype(np.float32),
                      kernel=kernel, mask=mask,
                      names=[f"im{i}" for i in range(n_devices)])
        out = runner.restore_batch(batch)
        assert out.shape == img_H.shape, (out.shape, img_H.shape)
        assert np.isfinite(out).all(), f"non-finite restore output ({task})"
        print(f"dryrun_restore: {task} dp({n_devices}): OK")

        if n_devices % 4 == 0:
            # dp x tp: same batch on a 2-D (data, model) mesh with
            # Megatron-style parameter sharding (parallel/tp.py) must
            # reproduce the data-parallel result — for EVERY prox family,
            # not just inpaint (VERDICT r2 item 3)
            cfg_tp = load_config(None, overrides=dict(
                task=task, model_name="tiny_test", iter_num=2, iter_num_U=1,
                batch_size=n_devices, noise_level_img=0.0, seed=0,
                dtype="float32", save_L=False, save_E=False,
                mesh_shape=(n_devices // 4, 4),
                **(dict(sf=2, sr_mode="blur") if task == "sr" else {})))
            out_tp = Runner(cfg_tp, use_mesh=True).restore_batch(batch)
            np.testing.assert_allclose(out_tp, out, rtol=0, atol=5e-5)
            print(f"dryrun_restore: {task} dp x tp"
                  f"({n_devices // 4}x4): OK (parity vs dp)")
        if task == "inpaint":
            inpaint_ctx = (cfg, runner, batch, out)
            if n_devices % 2 == 0:
                # sp: activations sharded on image height (GSPMD conv halo
                # exchanges, parallel/mesh.py:shard_image) — dp x sp, and
                # the full 3-D dp x tp x sp composition when 8 devices
                sp_meshes = [((n_devices // 2, 2), ("data", "space"))]
                if n_devices % 8 == 0:
                    sp_meshes.append(((n_devices // 4, 2, 2),
                                      ("data", "model", "space")))
                for shape_sp, axes_sp in sp_meshes:
                    cfg_sp = load_config(None, overrides=dict(
                        task=task, model_name="tiny_test", iter_num=2,
                        iter_num_U=1, batch_size=n_devices,
                        noise_level_img=0.0, seed=0, dtype="float32",
                        save_L=False, save_E=False,
                        mesh_shape=shape_sp, mesh_axes=axes_sp))
                    out_sp = Runner(cfg_sp, use_mesh=True).restore_batch(batch)
                    np.testing.assert_allclose(out_sp, out, rtol=0, atol=5e-5)
                    print(f"dryrun_restore: {task} "
                          f"{' x '.join(axes_sp)}{shape_sp}: OK (parity vs dp)")

    # deployment stage 1: exported mesh bundle executes on the virtual mesh
    # and reproduces the live runner (export.py records per-leaf
    # PartitionSpecs; load_bundle rebuilds the mesh on this host's devices)
    import tempfile

    from diffpir_tpu.export import load_bundle, save_bundle

    cfg, runner, batch, out = inpaint_ctx
    with tempfile.TemporaryDirectory() as td:
        path = save_bundle(
            runner, os.path.join(td, "bundle"), batch=n_devices,
            height=H, width=H, platforms=(jax.default_backend(),),
            allow_random_weights=True)
        loaded = load_bundle(path)
        got = loaded(batch.img_L, mask=batch.mask, seed=0)
    np.testing.assert_allclose(got, out, rtol=0, atol=5e-5)
    print(f"dryrun_restore: mesh bundle({n_devices}): OK (parity vs runner)")

    # deployment stage 2: one RestorationService coalescing round —
    # n_devices concurrent submit()s drain as one mesh-sharded batch
    from concurrent.futures import wait

    from diffpir_tpu.serve import RestorationService

    svc = RestorationService(cfg, use_mesh=True, service_batch=n_devices,
                             max_wait_ms=200.0, allow_random_weights=True)
    try:
        futs = [svc.submit(batch.img_L[i], mask=batch.mask[i])
                for i in range(n_devices)]
        wait(futs, timeout=600)
        outs = [f.result() for f in futs]
    finally:
        svc.close()
    assert all(np.isfinite(o).all() for o in outs)
    assert outs[0].shape == batch.img_L[0].shape
    print(f"dryrun_restore: serve coalescing({n_devices}): OK")
    print(f"dryrun_restore({n_devices}): OK "
          "(3-task dp + 3-task dp x tp + sp + dp x tp x sp + bundle + serve)")

"""Pin the two documented behavioral-equivalence claims against the reference.

SURVEY.md "Known gaps" argues (and VERDICT r2 asked to LOCK with tests):

(a) the ``skip_noise_model_t`` gate (``main_ddpir.py:391``) compares the LOOP
    INDEX ``i`` to ``T - noise_model_t`` and therefore cannot fire for any
    config with ``len(seq) <= T - noise_model_t`` (every shipped config);
    our ``build_plan`` models it as a prox-skip with the same index compare.

(b) the ``ddim_sample`` config flag is a no-op in ``pred_xstart`` output modes:
    reference ``model_fn`` (``utils/utils_model.py:221-247``) returns
    ``out["pred_xstart"]`` from either ``p_sample`` or ``ddim_sample(eta=0)``,
    and both produce the identical ``pred_xstart`` (same
    ``p_mean_variance -> process_xstart`` path).

These tests transcribe the reference branches so a future refactor of
``build_plan``/``sampler`` cannot silently break the equivalence arguments.
"""

import numpy as np
import pytest

from tests.conftest import add_reference_to_path, reference_available

from diffpir_tpu.schedule import NoiseSchedule, build_plan

T = 1000


def _reference_prox_mask(T, iter_num, skip_type, noise_model_t, t_start):
    """Transcription of the reference driver's gating around the data prox:
    seq construction (``main_ddpir.py:326-338``), skip-iters ``continue``
    (``:345-347`` — note the loop index keeps advancing over dropped steps),
    last-step guard (``:384`` — value compare, so duplicate quad tails are
    excluded), and the noise_model_t loop-index gate (``:391``)."""
    skip = T // iter_num
    if skip_type == "uniform":
        seq = [i * skip for i in range(iter_num)]
        if skip > 1:
            seq.append(T - 1)
    elif skip_type == "quad":
        seq = np.sqrt(np.linspace(0, T**2, iter_num))
        seq = [int(s) for s in list(seq)]
        seq[-1] = seq[-1] - 1
    else:
        raise ValueError(skip_type)
    mask = []
    for i in range(len(seq)):
        t_i = T - 1 - seq[i]  # exact-match find_nearest (tests/test_schedule)
        if t_i > t_start:
            continue
        mask.append((seq[i] != seq[-1]) and (i < T - noise_model_t))
    return mask


@pytest.mark.parametrize("skip_type", ["uniform", "quad"])
@pytest.mark.parametrize("noise_model_t", [0, 120, 500, 999])
@pytest.mark.parametrize("iter_num", [5, 20, 100, 880, 881, 999])
def test_noise_model_t_gate_matches_reference(skip_type, noise_model_t,
                                              iter_num):
    """build_plan's prox mask == the transcribed reference gate, INCLUDING
    the unreachable regime where the gate actually fires (iter_num large
    enough that the loop index reaches T - noise_model_t)."""
    sched = NoiseSchedule.linear(0.0001, 0.02, T)
    plan = build_plan(sched, iter_num=iter_num, skip_type=skip_type,
                      lambda_=1.0, eta=0.0, sigma_y=0.05,
                      noise_model_t=noise_model_t)
    want = _reference_prox_mask(T, iter_num, skip_type, noise_model_t,
                                t_start=T - 1)
    assert list(map(bool, plan.prox)) == want


@pytest.mark.parametrize("skip_type", ["uniform", "quad"])
def test_gate_cannot_fire_for_reachable_configs(skip_type):
    """The claim behind the prox-skip approximation: for every config with
    len(seq) <= T - noise_model_t (all shipped configs: NFE <= 100,
    noise_model_t <= ~250 even at noise_level_model=0.25), the gate never
    fires — prox applies at every non-final step, so modeling the
    reference's pred_x_prev fallback (``main_ddpir.py:407-413``) as dead
    code is behaviorally exact."""
    sched = NoiseSchedule.linear(0.0001, 0.02, T)
    for iter_num in (5, 20, 50, 100, 250, 880):
        for noise_model_t in (0, 60, 120):
            mask = _reference_prox_mask(T, iter_num, skip_type,
                                        noise_model_t, t_start=T - 1)
            n_seq = len(mask)
            assert n_seq <= T - noise_model_t
            # every skip comes from the LAST-STEP guard, never the gate:
            # identical to the noise_model_t=0 mask
            base = _reference_prox_mask(T, iter_num, skip_type, 0,
                                        t_start=T - 1)
            assert mask == base
            # and our plan agrees
            plan = build_plan(sched, iter_num=iter_num, skip_type=skip_type,
                              lambda_=1.0, eta=0.0, sigma_y=0.05,
                              noise_model_t=noise_model_t)
            assert list(map(bool, plan.prox)) == mask


def test_gate_respects_t_start_index_semantics():
    """Dropped steps (t_i > t_start) still advance the reference loop index,
    so the gate threshold is measured in FULL-seq positions — pin that
    build_plan keeps the full-seq index too."""
    sched = NoiseSchedule.linear(0.0001, 0.02, T)
    # iter_num=999, noise_model_t=500: gate fires from full-seq index 500 on.
    # t_start drops the first ~200 steps; if build_plan renumbered kept rows
    # from 0 the firing point would shift by the dropped count.
    plan = build_plan(sched, iter_num=999, skip_type="uniform", lambda_=1.0,
                      eta=0.0, sigma_y=0.05, noise_model_t=500, t_start=800)
    want = _reference_prox_mask(T, 999, "uniform", 500, t_start=800)
    assert list(map(bool, plan.prox)) == want
    assert not all(want) and any(want)  # the gate really fires in this setup


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_ddim_sample_flag_is_noop_for_pred_xstart():
    """Reference ``model_fn(..., ddim_sample=True/False)`` returns the
    identical pred_xstart (``utils/utils_model.py:221-247``): both branches
    reduce to ``p_mean_variance``'s clamped ``process_xstart`` output; only
    the (discarded) ``sample`` differs.  Locks SURVEY's "ddim_sample is a
    no-op in pred_xstart modes" claim on the tiny fixture."""
    add_reference_to_path()
    import torch
    from guided_diffusion.script_util import create_gaussian_diffusion
    from guided_diffusion.unet import UNetModel
    from utils import utils_model

    img = 16
    torch_model = UNetModel(
        image_size=img, in_channels=3, model_channels=32, out_channels=6,
        num_res_blocks=1, attention_resolutions=(2,), dropout=0.0,
        channel_mult=(1, 2), num_classes=None, use_checkpoint=False,
        use_fp16=False, num_heads=4, num_head_channels=16,
        num_heads_upsample=-1, use_scale_shift_norm=True,
        resblock_updown=True, use_new_attention_order=False,
    ).eval()
    sd = torch_model.state_dict()
    gen = torch.Generator().manual_seed(3)
    for k in sd:
        sd[k] = torch.randn(sd[k].shape, generator=gen) * 0.03
    torch_model.load_state_dict(sd)
    for p in torch_model.parameters():
        p.requires_grad_(False)

    diffusion = create_gaussian_diffusion(steps=T, learn_sigma=True,
                                          noise_schedule="linear")
    acp = torch.from_numpy(
        np.cumprod(1.0 - np.linspace(0.0001, 0.02, T), axis=0))
    x = torch.randn(2, 3, img, img, generator=torch.Generator().manual_seed(5))
    for sigma255 in (5.0, 40.0, 180.0):
        outs = []
        for flag in (False, True):
            outs.append(utils_model.model_fn(
                x.clone(), noise_level=sigma255, model_out_type="pred_xstart",
                model_diffusion=torch_model, diffusion=diffusion,
                ddim_sample=flag, alphas_cumprod=acp))
        np.testing.assert_array_equal(outs[0].numpy(), outs[1].numpy())

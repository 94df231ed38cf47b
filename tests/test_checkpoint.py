import numpy as np

from reduced_3dgs_tpu.trainer import BaseTrainer
from reduced_3dgs_tpu.trainer.checkpoint import load_checkpoint, save_checkpoint
from .test_trainer import _perturbed_model, _toy_scene


def test_checkpoint_resume_bit_exact(tmp_path):
    gt_model, ds = _toy_scene(n=12)

    model_a = _perturbed_model(gt_model, key=7)
    tr_a = BaseTrainer(model_a, ds)
    for i in range(4):
        tr_a.step(ds[i % len(ds)])
    p = str(tmp_path / "ckpt.npz")
    save_checkpoint(tr_a, p)
    # continue 3 more steps
    for i in range(4, 7):
        loss_a, _ = tr_a.step(ds[i % len(ds)])

    model_b = _perturbed_model(gt_model, key=999)  # different init
    tr_b = BaseTrainer(model_b, ds)
    load_checkpoint(tr_b, p)
    assert tr_b.curr_step == 4
    for i in range(4, 7):
        loss_b, _ = tr_b.step(ds[i % len(ds)])

    np.testing.assert_allclose(float(loss_b), float(loss_a), rtol=1e-6)
    for k, va in model_a.parameters().items():
        vb = model_b.parameters()[k]
        np.testing.assert_allclose(np.asarray(vb), np.asarray(va), atol=1e-7,
                                   err_msg=k)

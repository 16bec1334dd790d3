"""Forward-over-reverse (fjvp) train step vs the standard step.

The fjvp step (train/fjvp.py) must produce the SAME gradients and
parameter trajectory as reverse-over-reverse `make_train_step` on the
ALIGNN-FF E/F/S recipe — the restructure is an exact identity for L1
losses (a.e.), not an approximation.  Runs on the XLA scatter path
(CPU default), where jvp through the model is supported.
"""

import numpy as np
import pytest


def _setup(graphs=6, hidden=32, layers=1, graphwise=1.0, gradwise=10.0,
           stresswise=0.1, atomwise=0.0, seed=0):
    import jax

    from alignn_tpu.nn.models import ALIGNNAtomWise, ALIGNNAtomWiseConfig
    from alignn_tpu.train.optim import build_optimizer
    from alignn_tpu.train.state import create_train_state
    from tools.gp_sweep import build_batch

    batch = build_batch(graphs, seed=seed)
    # attach forces/stress targets
    rng = np.random.default_rng(seed + 1)
    batch = batch.replace(
        forces=(rng.standard_normal(batch.forces.shape) * 0.1
                ).astype(np.float32),
        stress=(rng.standard_normal(batch.stress.shape) * 0.01
                ).astype(np.float32))
    cfg = ALIGNNAtomWiseConfig(
        name="alignn_atomwise", alignn_layers=layers, gcn_layers=layers,
        hidden_features=hidden, embedding_features=16,
        graphwise_weight=graphwise, gradwise_weight=gradwise,
        stresswise_weight=stresswise, atomwise_weight=atomwise)
    model = ALIGNNAtomWise(cfg=cfg)
    tx = build_optimizer("adamw", 1e-3, 1e-5)
    state = create_train_state(model, batch, tx)
    return model, state, batch


def _max_rel_err(a, b):
    import jax

    errs = []
    for x, y in zip(jax.tree_util.tree_leaves(a),
                    jax.tree_util.tree_leaves(b)):
        x, y = np.asarray(x, np.float64), np.asarray(y, np.float64)
        scale = np.maximum(np.abs(x), np.abs(y)).max() + 1e-12
        errs.append(np.abs(x - y).max() / scale)
    return max(errs)


def test_fjvp_matches_standard_step():
    from alignn_tpu.train.fjvp import make_train_step_fjvp
    from alignn_tpu.train.state import make_train_step

    model, state, batch = _setup()
    std = make_train_step(model, donate=False)
    fjv = make_train_step_fjvp(model, donate=False)

    s_std, l_std = std(state, batch)
    s_fjv, l_fjv = fjv(state, batch)

    for k in ("loss", "loss1", "loss3", "loss4"):
        np.testing.assert_allclose(float(l_std[k]), float(l_fjv[k]),
                                   rtol=1e-5, err_msg=k)
    err = _max_rel_err(s_std.params, s_fjv.params)
    assert err < 5e-4, f"param trajectory diverged: max rel err {err}"


def test_fjvp_multi_step_trajectory():
    from alignn_tpu.train.fjvp import make_train_step_fjvp
    from alignn_tpu.train.state import make_train_step

    model, state, batch = _setup(graphs=4, gradwise=5.0, stresswise=0.05)
    std = make_train_step(model, donate=False)
    fjv = make_train_step_fjvp(model, donate=False)

    s1, s2 = state, state
    for _ in range(3):
        s1, l1 = std(s1, batch)
        s2, l2 = fjv(s2, batch)
    np.testing.assert_allclose(float(l1["loss"]), float(l2["loss"]),
                               rtol=5e-4)
    err = _max_rel_err(s1.params, s2.params)
    assert err < 2e-3, f"3-step trajectory diverged: max rel err {err}"


def test_fjvp_energy_only_and_forces_only():
    from alignn_tpu.train.fjvp import make_train_step_fjvp
    from alignn_tpu.train.state import make_train_step

    # stress off, atomwise on — exercises the direct-head terms
    model, state, batch = _setup(gradwise=3.0, stresswise=0.0)
    std = make_train_step(model, donate=False)
    fjv = make_train_step_fjvp(model, donate=False)
    s_std, _ = std(state, batch)
    s_fjv, _ = fjv(state, batch)
    assert _max_rel_err(s_std.params, s_fjv.params) < 5e-4


def test_fjvp_rejects_out_of_scope_configs():
    from alignn_tpu.nn.models import ALIGNN, ALIGNNConfig
    from alignn_tpu.train.fjvp import make_train_step_fjvp

    model, _, _ = _setup(graphs=2)

    with pytest.raises(ValueError, match="L1"):
        make_train_step_fjvp(model, criterion="mse")
    with pytest.raises(ValueError, match="regression"):
        make_train_step_fjvp(model, classification=True)
    prop = ALIGNN(cfg=ALIGNNConfig(
        name="alignn", alignn_layers=1, gcn_layers=1,
        hidden_features=16, embedding_features=8))
    with pytest.raises(ValueError, match="ALIGNNAtomWise"):
        make_train_step_fjvp(prop)

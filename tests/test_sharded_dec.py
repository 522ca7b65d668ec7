"""DEC fine-tuning under the 8-device data mesh: the full p1->p3 flow with
batch-sharded inputs must train, track delta, and produce valid dumps."""

import numpy as np
import pytest

from deep_interpolation_clustering_tpu import Config
from deep_interpolation_clustering_tpu.data import (
    ArrayDataset,
    make_synthetic_cohorts,
    process_splits,
)
from deep_interpolation_clustering_tpu.parallel import make_mesh
from deep_interpolation_clustering_tpu.train import ClusterTrainer, Trainer


@pytest.mark.slow
def test_sharded_dec_end_to_end(tmp_path):
    raw = make_synthetic_cohorts(n_total=160, max_obs=16, seed=5, split=(0.8, 0.1, 0.1))
    cohorts = process_splits(raw, rng=np.random.RandomState(0))

    def mk(cfg):
        return {c: ArrayDataset(cfg, d, c) for c, d in cohorts.items()}

    pre_cfg = Config(
        batch_size=16, num_timestamps=16, max_epochs=2,
        log_train_freq=1000, log_valid_freq=1000, kmeans_n_init=2,
    )
    mesh = make_mesh(8)
    pre = Trainer(pre_cfg, mk(pre_cfg), str(tmp_path / "pre"), mesh=mesh,
                  use_tensorboard=False)
    pre.train()

    cfg = pre_cfg.replace(
        loss="ae_mse_sup_fake_detect_kl", cluster_number=3, max_epochs=3,
        stopping_delta=None,
    )
    tr = ClusterTrainer(
        cfg, mk(cfg), str(tmp_path / "dec"),
        pretrain_exp_path=str(tmp_path / "pre"), mesh=mesh,
        use_tensorboard=False,
    )
    valid = tr.train()
    assert np.isfinite(valid["kl"]) and 0.0 <= valid["delta"] <= 1.0
    dumps = tr.eval("testing", generate_feat=False)
    n = len(tr.datasets["testing"])
    assert dumps["cluster_pred"].shape == (n, 3)
    np.testing.assert_allclose(dumps["cluster_pred"].sum(1), 1.0, rtol=1e-4)

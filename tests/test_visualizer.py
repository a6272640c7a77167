import numpy as np

from pyitd_tpu.ml.visualizer import MatrixDashboard


def test_dashboard_renders_and_tracks_loss():
    dash = MatrixDashboard(n_cols=16, n_rows=4, cell=4)
    rng = np.random.default_rng(0)
    img = None
    for step in range(10):
        pred = rng.integers(0, 4, 16)
        target = pred.copy()
        target[: step % 5] += 1  # some wrong tokens
        img = dash.update(pred, target, loss=2.0 / (step + 1))
    assert img.dtype == np.uint8
    assert img.shape == (4 * 4 + 8, 16 * 4, 3)
    assert img.max() > 0
    # EWMA decreases with decreasing loss
    assert dash.loss_hist[-1] < dash.loss_hist[0] + 1e-9


def test_flame_attention_panel():
    from pyitd_tpu.ml.visualizer import flame_attention_panel

    rng = np.random.default_rng(1)
    attn = rng.random((2, 8, 8))
    img = flame_attention_panel(attn, cell=3)
    assert img.dtype == np.uint8
    assert img.shape == (24, 24 * 2 + 2, 3)

"""utils/logging.py + utils/profiling.py behaviors pinned in round 3."""
import numpy as np

from pianobart_tpu.utils.logging import MetricsLogger
from pianobart_tpu.utils.profiling import StepTimer, block


def test_step_echo_fires_on_stride_counters(tmp_path, capsys):
    """Callers advance the step counter in dispatch strides (e.g. 8) that
    rarely divide `every`; divisibility-gated echo silently skipped most
    echo points (round-3 review)."""
    lg = MetricsLogger(str(tmp_path), echo=True)
    for step in range(8, 808, 8):          # strides of 8, every=50
        lg.step_echo(step, {"loss": np.float32(1.0)}, every=50)
    out = capsys.readouterr().out
    echoes = [l for l in out.splitlines() if l.startswith("step ")]
    # 800/50 = 16 echo windows; the old % check fired only at 200,400,...
    assert len(echoes) >= 15, echoes


def test_step_timer_returns_wall_time():
    with StepTimer() as t:
        t.observe(np.arange(8))
    assert t.last_ms is not None and t.last_ms >= 0.0
    block({"a": np.arange(3), "b": None})   # host arrays + None tolerated

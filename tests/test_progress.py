"""Step-weighted progress/ETA (ProgressRedraw model, main.pas:3581-3631,
weights main.pas:61) and the progressive process runner
(internalRuncommand, extern.pas:94-200)."""
import subprocess
import sys

import pytest

from tiler_tpu.utils.progress import STEP_WEIGHTS, StepProgress, run_command


def test_weights_match_reference_table():
    # cEncoderStepLen = (0, 2, 3, 1, 5, 2, 2, 2, 1) skipping esNone
    assert list(STEP_WEIGHTS.values()) == [2, 3, 1, 5, 2, 2, 2, 1]


def test_fraction_and_eta_progression():
    p = StepProgress()
    assert p.fraction == 0 and p.eta_seconds() is None
    p.finish_step('load')
    assert p.fraction == pytest.approx(2 / 18)
    assert p.eta_seconds() is not None and p.eta_seconds() >= 0
    for s in ('dither', 'make_unique', 'global_tiling', 'frame_tiling',
              'reindex', 'smooth', 'save'):
        p.finish_step(s)
    assert p.fraction == 1.0
    assert p.eta_seconds() == pytest.approx(0.0, abs=1e-6)
    assert p.format_suffix().startswith('100%')


def test_partial_range_uses_subset_weights():
    p = StepProgress(('dither', 'make_unique'))
    p.finish_step('dither')
    assert p.fraction == pytest.approx(3 / 4)


def test_run_command_captures_both_streams():
    code, out, err = run_command([
        sys.executable, '-c',
        'import sys; print("to stdout"); print("to stderr", '
        'file=sys.stderr)'])
    assert code == 0
    assert 'to stdout' in out
    assert 'to stderr' in err


def test_run_command_big_interleaved_output_no_deadlock():
    # fill both pipe buffers well past 64KB to prove the pump never blocks
    code, out, err = run_command([
        sys.executable, '-c',
        'import sys\n'
        'for i in range(20000):\n'
        '    print("O" * 20)\n'
        '    print("E" * 20, file=sys.stderr)\n'])
    assert code == 0
    assert out.count('O' * 20) == 20000
    assert err.count('E' * 20) == 20000


def test_run_command_exit_code_and_timeout():
    code, _, _ = run_command([sys.executable, '-c', 'raise SystemExit(3)'])
    assert code == 3
    with pytest.raises(subprocess.TimeoutExpired):
        run_command([sys.executable, '-c', 'import time; time.sleep(30)'],
                    timeout=0.5)

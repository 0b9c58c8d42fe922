"""CLI tests: flag parity with the reference parser, headless rendering."""

import subprocess
import sys

import numpy as np
import pytest

from hamilton_tpu.cli import SimOpts, build_parser, _example_from_args
from hamilton_tpu.render import PlotRange, plot


class TestParser:
    def test_default_is_doublepend_1_1(self):
        """No subcommand → doublepend m1=1 m2=1 (app/Examples.hs:196)."""
        args = build_parser().parse_args([])
        ex = _example_from_args(args)
        assert ex.name == "Double pendulum"

    @pytest.mark.parametrize(
        "argv,name",
        [
            (["doublepend", "--m1", "2", "--m2", "3"], "Double pendulum"),
            (["pend", "-a", "30", "-v", "2"], "Single pendulum"),
            (["room", "-a", "60"], "Room"),
            (["twobody", "--m1", "4", "--m2", "1", "-v", "0.3"], "Two-Body"),
            (["spring", "-b", "1", "-w", "2", "-k", "5", "-x", "0.2"],
             "Spring hanging from block"),
            (["bezier", "-p", "[(0,0),(1,1)]"], "Bezier"),
            (["chain", "-n", "6"], "6-link chain"),
        ],
    )
    def test_subcommands(self, argv, name):
        args = build_parser().parse_args(argv)
        ex = _example_from_args(args)
        assert ex.name == name

    def test_reference_defaults(self):
        """Per-flag defaults match app/Examples.hs:230-351."""
        p = build_parser()
        a = p.parse_args(["pend"])
        assert (a.angle, a.vel) == (0.0, 1.0)
        a = p.parse_args(["room"])
        assert a.angle == 45.0
        a = p.parse_args(["twobody"])
        assert (a.m1, a.m2, a.vel) == (5.0, 0.5, 0.5)
        a = p.parse_args(["spring"])
        assert (a.block, a.weight, a.k, a.x) == (2.0, 1.0, 10.0, 0.1)

    def test_pend_angle_converted_from_degrees(self):
        args = build_parser().parse_args(["pend", "-a", "90"])
        ex = _example_from_args(args)
        np.testing.assert_allclose(float(ex.init_config.q[0]), np.pi / 2, rtol=1e-12)

    def test_bad_bezier_points(self):
        args = build_parser().parse_args(["bezier", "-p", "not points"])
        with pytest.raises(SystemExit):
            _example_from_args(args)

    def test_empty_bezier_points(self):
        args = build_parser().parse_args(["bezier", "-p", "[]"])
        with pytest.raises(SystemExit):
            _example_from_args(args)

    def test_platform_defaults_to_cpu(self):
        """Interactive/single-trajectory work is measured faster on the host
        (docs/design.md round-3 adaptive numbers), so the CLI pins CPU unless
        the user opts out with --platform default."""
        assert build_parser().parse_args([]).platform == "cpu"
        args = build_parser().parse_args(["--platform", "default", "pend"])
        assert args.platform == "default"

    def test_sim_opts_defaults(self):
        """SO 0.5 1 25 (app/Examples.hs:387)."""
        o = SimOpts()
        assert (o.zoom, o.rate, o.hist) == (0.5, 1.0, 25)


class TestHeadless:
    def test_headless_subprocess(self):
        """The CLI surface end-to-end: frames render, H line present."""
        out = subprocess.run(
            [sys.executable, "-m", "hamilton_tpu.cli", "--frames", "3",
             "--no-color", "pend", "-a", "10"],
            capture_output=True, text=True, timeout=300,
            env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
                 "PYTHONPATH": "/root/repo", "HOME": "/root"},
        )
        assert out.returncode == 0, out.stderr
        assert "[ Single pendulum ]" in out.stdout
        assert "H :" in out.stdout

    def test_headless_fixed_method(self):
        out = subprocess.run(
            [sys.executable, "-m", "hamilton_tpu.cli", "--frames", "2",
             "--no-color", "--method", "leapfrog"],
            capture_output=True, text=True, timeout=300,
            env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
                 "PYTHONPATH": "/root/repo", "HOME": "/root"},
        )
        assert out.returncode == 0, out.stderr
        assert "[ Double pendulum ]" in out.stdout

    @pytest.mark.slow
    def test_dt_honored_at_any_rate(self):
        """With --dt given, the substep size must track the actual frame
        advance rate/FPS — including after interactive rate changes — not a
        hardcoded rate of 1 (reference substep semantics)."""
        from hamilton_tpu.cli import FPS, _make_step
        from hamilton_tpu.integrators.evolve import evolve_ham_fixed
        from hamilton_tpu.models import double_pendulum

        ex = double_pendulum()
        dt_req = 1e-3
        step = _make_step(ex, "leapfrog", dt_req)
        for rate in (1.0, 2.37):  # 2.37 ≈ a few '>' presses
            frame_dt = rate / FPS
            got = step(ex.init_phase, frame_dt)
            n_sub = max(1, round(frame_dt / dt_req))
            # effective substep within rounding of the requested dt
            assert abs(frame_dt / n_sub - dt_req) <= dt_req / n_sub
            want = evolve_ham_fixed(
                ex.system, ex.init_phase, frame_dt / n_sub, n_sub,
                method="leapfrog", emit_every=n_sub,
            )
            np.testing.assert_allclose(
                np.asarray(got.q), np.asarray(want.q[-1]), rtol=1e-12
            )

    def test_non_tty_without_frames_errors(self):
        out = subprocess.run(
            [sys.executable, "-m", "hamilton_tpu.cli"],
            capture_output=True, text=True, timeout=120,
            stdin=subprocess.DEVNULL,
            env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
                 "PYTHONPATH": "/root/repo", "HOME": "/root"},
        )
        assert out.returncode == 2
        assert "tty" in out.stderr


class TestRender:
    def test_plot_axes_and_origin(self):
        pr = PlotRange.from_x((-1, 1), 40, 20)
        lines = plot(40, 20, pr, [], color=False)
        assert len(lines) == 20
        joined = "\n".join(lines)
        assert "+" in joined and "-" in joined and "|" in joined
        assert "-1.00" in joined and "1.00" in joined

    def test_plot_point_visible(self):
        pr = PlotRange.from_x((-1, 1), 40, 20)
        lines = plot(40, 20, pr, [(0.5, 0.0, "o", "red")], color=False)
        assert any("o" in l for l in lines)

    def test_point_out_of_bounds_cropped(self):
        pr = PlotRange.from_x((-1, 1), 40, 20)
        lines = plot(40, 20, pr, [(5.0, 5.0, "o", "red")], color=False)
        assert not any("o" in l for l in lines)

    def test_color_codes_emitted(self):
        pr = PlotRange.from_x((-1, 1), 40, 20)
        lines = plot(40, 20, pr, [(0.0, 0.1, "o", "red")], color=True)
        assert any("\x1b[31m" in l for l in lines)


class TestInteractivePty:
    def test_interactive_loop_keys_and_quit(self):
        """Drive the real interactive loop through a pseudo-tty: frames
        render, '+' applies the reference's sqrt-2 zoom (app/Examples.hs:488),
        'q' exits cleanly restoring the screen."""
        import os
        import pty
        import re
        import select
        import subprocess
        import time

        master, slave = pty.openpty()
        env = {"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
               "PYTHONPATH": "/root/repo", "HOME": "/root",
               "TERM": "xterm-256color", "COLUMNS": "80", "LINES": "24"}
        proc = subprocess.Popen(
            [sys.executable, "-m", "hamilton_tpu.cli", "pend", "-a", "20"],
            stdin=slave, stdout=slave, stderr=subprocess.PIPE, env=env,
            close_fds=True,
        )
        os.close(slave)
        out = b""
        sent = False
        t0 = time.time()
        try:
            while time.time() - t0 < 240 and proc.poll() is None:
                r, _, _ = select.select([master], [], [], 0.5)
                if not r:
                    continue
                try:
                    out += os.read(master, 65536)
                except OSError:
                    break
                if b"H :" in out and not sent:
                    os.write(master, b"+")
                    time.sleep(0.5)
                    os.write(master, b"q")
                    sent = True
            rc = proc.wait(timeout=30)
        finally:
            if proc.poll() is None:
                proc.kill()
            os.close(master)
        assert rc == 0, proc.stderr.read().decode()[-500:]
        assert b"\x1b[?1049h" in out and b"\x1b[?1049l" in out
        assert b"[ Single pendulum ]" in out
        zooms = {z.decode() for z in re.findall(rb"zoom: x(\d+\.\d+)", out)}
        assert "0.71" in zooms, zooms  # 0.5 * sqrt(2)

"""CLI surface: every subcommand parses -h (reference test_cli.py:6-14
semantics) plus argparser round-trips."""

import subprocess
import sys

import pytest

import bonito_tpu

MODULES = bonito_tpu.modules


class TestCLI:
    @pytest.mark.parametrize("tool", MODULES)
    def test_help_runs(self, tool):
        out = subprocess.run(
            [sys.executable, "-m", "bonito_tpu", tool, "-h"],
            capture_output=True, text=True, timeout=120,
            env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
                 "PYTHONPATH": "/root/repo"},
        )
        assert out.returncode == 0, out.stderr
        assert "usage" in out.stdout.lower()

    def test_version(self):
        out = subprocess.run(
            [sys.executable, "-m", "bonito_tpu", "-v"],
            capture_output=True, text=True, timeout=120,
            env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
                 "PYTHONPATH": "/root/repo"},
        )
        assert out.returncode == 0
        assert bonito_tpu.__version__ in out.stdout

    @pytest.mark.parametrize("tool", MODULES)
    def test_argparser_builds(self, tool):
        from importlib import import_module
        mod = import_module(f"bonito_tpu.cli.{tool}")
        parser = mod.argparser()
        assert parser is not None

"""Shim for legacy editable installs (`pip install -e .`) on hosts without
the `wheel` package — all metadata lives in pyproject.toml."""

from setuptools import setup

setup()

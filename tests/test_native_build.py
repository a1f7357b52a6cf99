"""The native library must BUILD whenever a C++ toolchain is present.

tests/test_native_io.py module-skips when `native_io.available()` is
False — correct for machines without a toolchain, but it means a compile
break in native/kfnet_native.cpp would turn every parity test into a
silent green skip while production quietly falls back to the slow PIL
path. This file exists outside that module mark so the break FAILS CI
(review r2)."""

import shutil

import pytest

from kfnet_tpu.data import native_io


def test_native_builds_when_toolchain_present():
  if shutil.which("g++") is None:
    pytest.skip("no C++ toolchain on this machine")
  assert native_io.available(), (
      "g++ is present but the native library failed to build/load — "
      "run `make -C native` for the compiler output")

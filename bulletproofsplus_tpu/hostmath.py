"""ctypes bindings for the native C++ host-math library (native/hostmath.cpp).

The host-side analogue of the reference's mcl dependency (SURVEY.md L0): a
fast CPU implementation of the same field/curve/MSM semantics, used for
proof-byte checks, test-vector generation, and as a non-TPU fallback oracle.
Compiled lazily with g++ on first use; the .so is cached next to the source.

Interface convention: field elements cross the boundary as PLAIN-form Python
ints; points as affine tuples (None = identity). Montgomery conversion and
projective/extended coordinates live entirely on the C++ side.
"""
from __future__ import annotations

import ctypes
import functools
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native"
)
_SRC = os.path.join(_NATIVE_DIR, "hostmath.cpp")
_SO = os.path.join(_NATIVE_DIR, "hostmath.so")

MAXL = 6


def _build() -> str:
    if (not os.path.exists(_SO)) or (
        os.path.getmtime(_SO) < os.path.getmtime(_SRC)
    ):
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", _SO, _SRC],
            check=True,
            capture_output=True,
        )
    return _SO


@functools.lru_cache(maxsize=None)
def _lib():
    lib = ctypes.CDLL(_build())
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.bpp_field_new.restype = ctypes.c_void_p
    lib.bpp_field_new.argtypes = [u64p, u64p, u64p, ctypes.c_uint64, ctypes.c_int]
    lib.bpp_curve_new.restype = ctypes.c_void_p
    lib.bpp_curve_new.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, u64p]
    for name, nargs in [
        ("bpp_to_mont", 3), ("bpp_from_mont", 3), ("bpp_field_mul", 4),
        ("bpp_field_add", 4), ("bpp_field_sub", 4),
    ]:
        fn = getattr(lib, name)
        fn.restype = None
        fn.argtypes = [ctypes.c_void_p] + [u64p] * (nargs - 1)
    lib.bpp_field_inv.restype = None
    lib.bpp_field_inv.argtypes = [ctypes.c_void_p, u64p, u64p, u64p, ctypes.c_int]
    lib.bpp_scalar_mul.restype = None
    lib.bpp_scalar_mul.argtypes = [ctypes.c_void_p, u64p, u64p, u64p, ctypes.c_int]
    lib.bpp_point_add.restype = None
    lib.bpp_point_add.argtypes = [ctypes.c_void_p, u64p, u64p, u64p]
    lib.bpp_msm.restype = None
    lib.bpp_msm.argtypes = [ctypes.c_void_p, u64p, u64p, u64p, ctypes.c_long, ctypes.c_int]
    return lib


def _limbs64(x: int, L: int) -> np.ndarray:
    out = np.zeros(L, dtype=np.uint64)
    for i in range(L):
        out[i] = x & 0xFFFFFFFFFFFFFFFF
        x >>= 64
    assert x == 0
    return out


def _unlimbs64(arr) -> int:
    x = 0
    for i in range(len(arr) - 1, -1, -1):
        x = (x << 64) | int(arr[i])
    return x


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


class HostField:
    def __init__(self, p: int):
        self.p = p
        self.L = max(4, -(-p.bit_length() // 64))
        R = 1 << (64 * self.L)
        self.R = R
        p_l = _limbs64(p, self.L)
        r2_l = _limbs64(R * R % p, self.L)
        one_l = _limbs64(R % p, self.L)
        n0inv = (-pow(p, -1, 1 << 64)) % (1 << 64)
        self.ctx = _lib().bpp_field_new(
            _ptr(p_l), _ptr(r2_l), _ptr(one_l), n0inv, self.L
        )
        self._pm2 = _limbs64(p - 2, self.L)

    def to_mont(self, x: int) -> np.ndarray:
        out = np.zeros(self.L, np.uint64)
        a = _limbs64(x % self.p, self.L)
        _lib().bpp_to_mont(self.ctx, _ptr(out), _ptr(a))
        return out

    def from_mont(self, arr) -> int:
        out = np.zeros(self.L, np.uint64)
        a = np.ascontiguousarray(arr, np.uint64)
        _lib().bpp_from_mont(self.ctx, _ptr(out), _ptr(a))
        return _unlimbs64(out)

    def _binop(self, name, a: int, b: int) -> int:
        am, bm = self.to_mont(a), self.to_mont(b)
        out = np.zeros(self.L, np.uint64)
        getattr(_lib(), name)(self.ctx, _ptr(out), _ptr(am), _ptr(bm))
        return self.from_mont(out)

    def mul(self, a, b):
        return self._binop("bpp_field_mul", a, b)

    def add(self, a, b):
        return self._binop("bpp_field_add", a, b)

    def sub(self, a, b):
        return self._binop("bpp_field_sub", a, b)

    def inv(self, a):
        am = self.to_mont(a)
        out = np.zeros(self.L, np.uint64)
        _lib().bpp_field_inv(self.ctx, _ptr(out), _ptr(am), _ptr(self._pm2), self.L)
        return self.from_mont(out)


class HostCurve:
    """Native curve over the golden-model parameterization."""

    def __init__(self, name: str):
        from .golden import curves as gc

        self.name = name
        self.gold = gc.CURVES[name]
        self.fp = HostField(self.gold.fp.p)
        self.fn = HostField(self.gold.fn.p)
        if name in ("bls12_381", "secp256k1"):
            self.kind = 0
            const = self.fp.to_mont(3 * self.gold.b)
            self.nc = 3
        else:
            self.kind = 1
            const = self.fp.to_mont(2 * self.gold.d % self.fp.p)
            self.nc = 4
        self.ctx = _lib().bpp_curve_new(self.fp.ctx, self.fn.ctx, self.kind, _ptr(const))

    # -- affine tuple ↔ native coord buffer --

    def _enc(self, P) -> np.ndarray:
        buf = np.zeros(self.nc * self.fp.L, np.uint64)
        L = self.fp.L
        if P is None:
            if self.kind == 0:
                buf[L:2 * L] = self.fp.to_mont(1)  # (0,1,0)
            else:
                buf[L:2 * L] = self.fp.to_mont(1)
                buf[2 * L:3 * L] = self.fp.to_mont(1)  # (0,1,1,0)
            return buf
        x, y = P
        buf[0:L] = self.fp.to_mont(x)
        buf[L:2 * L] = self.fp.to_mont(y)
        buf[2 * L:3 * L] = self.fp.to_mont(1)
        if self.kind == 1:
            buf[3 * L:4 * L] = self.fp.to_mont(x * y % self.fp.p)
        return buf

    def _dec(self, buf):
        L = self.fp.L
        p = self.fp.p
        Z = self.fp.from_mont(buf[2 * L:3 * L])
        if self.kind == 0:
            if Z == 0:
                return None
            zi = pow(Z, p - 2, p)
            return (
                self.fp.from_mont(buf[0:L]) * zi % p,
                self.fp.from_mont(buf[L:2 * L]) * zi % p,
            )
        zi = pow(Z, p - 2, p)
        x = self.fp.from_mont(buf[0:L]) * zi % p
        y = self.fp.from_mont(buf[L:2 * L]) * zi % p
        if x == 0 and y == 1:
            return None
        return (x, y)

    def add(self, P, Q):
        out = np.zeros(self.nc * self.fp.L, np.uint64)
        _lib().bpp_point_add(self.ctx, _ptr(out), _ptr(self._enc(P)), _ptr(self._enc(Q)))
        return self._dec(out)

    def mul(self, P, k: int):
        out = np.zeros(self.nc * self.fp.L, np.uint64)
        kl = _limbs64(k % self.fn.p, self.fn.L)
        _lib().bpp_scalar_mul(self.ctx, _ptr(out), _ptr(self._enc(P)), _ptr(kl), self.fn.L)
        return self._dec(out)

    def msm(self, scalars, points):
        n = len(points)
        sL = self.fn.L
        sc = np.zeros(n * sL, np.uint64)
        pb = np.zeros(n * self.nc * self.fp.L, np.uint64)
        for i, (s, P) in enumerate(zip(scalars, points)):
            sc[i * sL:(i + 1) * sL] = _limbs64(s % self.fn.p, sL)
            pb[i * self.nc * self.fp.L:(i + 1) * self.nc * self.fp.L] = self._enc(P)
        out = np.zeros(self.nc * self.fp.L, np.uint64)
        _lib().bpp_msm(self.ctx, _ptr(out), _ptr(sc), _ptr(pb), n, sL)
        return self._dec(out)


@functools.lru_cache(maxsize=None)
def host_curve(name: str) -> HostCurve:
    return HostCurve(name)

"""Opt-in int8 quantized inference convs (TPU MXU int8 path).

The v5e MXU runs int8 x int8 -> int32 at 2x the bf16 rate, and the measured
gain on this chip is ~2.2x for 3x3 convs at >=256 channels
(``tools/mxu_probe.py``).  ``QuantConv`` is an ``nn.Conv`` drop-in whose
parameter tree is byte-identical (same 'kernel'/'bias' names, shapes and
dtypes, so trained checkpoints load unchanged); at apply time it

- quantizes the KERNEL per-output-channel symmetric int8
  (``scale_w[o] = max|k[..., o]| / 127``),
- quantizes the ACTIVATION dynamically per-tensor symmetric int8
  (``scale_x = max|x| / 127``, computed on device each call),
- convolves in int8 with an int32 accumulator on the MXU,
- dequantizes with the folded ``scale_x * scale_w`` epilogue and adds the
  f32 bias.

Only layers where int8 actually wins are quantized: dense (non-grouped)
convs whose input AND output channel counts are both >= ``min_channels``
(narrow convs are lane-padding-bound, not MXU-bound, and depthwise convs
never touch the MXU).  Everything else silently falls back to the exact
``nn.Conv`` path, so a quantized model is a mixed int8/bf16 network.

This is an accuracy/speed trade-off and therefore OPT-IN
(``build_model(name, quantized=True)`` / ``getSegmentation(...,
quantized=True)``); the measured probability-map deviation on the synthetic
fixture is recorded in PARITY.md.  The reference has no quantized path
(TF1 fp32/fp16 only, ``reference DigiPathAI/Segmentation.py:60-99``).
"""

from __future__ import annotations

import flax.linen as nn
import jax.lax as lax
import jax.numpy as jnp


class QuantConv(nn.Conv):
    """``nn.Conv`` drop-in that runs eligible convs in int8 on the MXU."""

    min_channels: int = 192

    def _eligible(self, cin: int) -> bool:
        return (self.feature_group_count == 1
                and min(cin, self.features) >= self.min_channels
                and all(d == 1 for d in self._dil()))

    def _dil(self):
        d = self.kernel_dilation
        if d is None:
            return (1, 1)
        return (d, d) if isinstance(d, int) else tuple(d)

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        if not self._eligible(cin):
            return super().__call__(x)

        kh, kw = (self.kernel_size if not isinstance(self.kernel_size, int)
                  else (self.kernel_size, self.kernel_size))
        kernel = self.param("kernel", self.kernel_init,
                            (kh, kw, cin, self.features), self.param_dtype)
        bias = (self.param("bias", self.bias_init, (self.features,),
                           self.param_dtype) if self.use_bias else None)

        # per-output-channel symmetric weight quantization
        k32 = kernel.astype(jnp.float32)
        w_amax = jnp.max(jnp.abs(k32), axis=(0, 1, 2), keepdims=True)
        scale_w = jnp.maximum(w_amax, 1e-12) / 127.0
        kq = jnp.round(k32 / scale_w).astype(jnp.int8)

        x32 = x.astype(jnp.float32)
        scale_x, xq = self._quantize_activation(x32)

        strides = (self.strides if not isinstance(self.strides, int)
                   else (self.strides, self.strides)) or (1, 1)
        padding = self.padding
        if isinstance(padding, int):
            padding = ((padding, padding), (padding, padding))
        y = lax.conv_general_dilated(
            xq, kq, tuple(strides), padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (scale_x * scale_w[0, 0, 0])
        if bias is not None:
            y = y + bias.astype(jnp.float32)
        return y.astype(self.dtype)

    def _quantize_activation(self, x32):
        """Dynamic per-tensor symmetric activation quantization: an extra
        full reduction + materialized pass over the activation each call —
        measured to cancel the MXU int8 gain on v5e (BASELINE.md round 2)."""
        x_amax = jnp.max(jnp.abs(x32))
        scale_x = jnp.maximum(x_amax, 1e-12) / 127.0
        return scale_x, jnp.round(x32 / scale_x).astype(jnp.int8)


class QuantConvCalib(QuantConv):
    """Calibration pass: records the running per-layer activation abs-max
    into the ``calib`` variable collection (apply with
    ``mutable=["calib"]``), while running the dynamic path."""

    def _quantize_activation(self, x32):
        x_amax = jnp.max(jnp.abs(x32))
        v = self.variable("calib", "amax", lambda: jnp.zeros((), jnp.float32))
        if self.is_mutable_collection("calib"):
            v.value = jnp.maximum(v.value, x_amax)
        scale_x = jnp.maximum(x_amax, 1e-12) / 127.0
        return scale_x, jnp.round(x32 / scale_x).astype(jnp.int8)


class QuantConvStatic(QuantConv):
    """Static-calibrated int8 (VERDICT r3 item 1a): the activation scale is
    a per-layer CONSTANT from the ``calib`` collection, so quantization is a
    pure elementwise scale+round+clip that XLA fuses into the producer's
    epilogue — no abs-max reduction, no extra materialized pass.  Values
    beyond the calibrated range clip to +-127 (the accuracy trade recorded
    in PARITY.md)."""

    def _quantize_activation(self, x32):
        if self.is_initializing():
            return super()._quantize_activation(x32)  # shapes only
        if not self.has_variable("calib", "amax"):
            raise ValueError(
                "quantized='static' needs calibrated variables: run "
                "models.quant.calibrate() first (missing calib/amax for "
                f"{self.name})")
        amax = self.get_variable("calib", "amax")
        scale_x = jnp.maximum(amax, 1e-12) / 127.0
        xq = jnp.clip(jnp.round(x32 / scale_x), -127.0, 127.0).astype(jnp.int8)
        return scale_x, xq


def conv_ctor(quantized):
    """The conv constructor models should use.

    ``False`` -> exact ``nn.Conv``; ``True``/``"dynamic"`` -> per-call
    dynamic scales; ``"calib"`` -> dynamic + record abs-max into the
    ``calib`` collection; ``"static"`` -> constant calibrated scales."""
    if not quantized:
        return nn.Conv
    if quantized == "calib":
        return QuantConvCalib
    if quantized == "static":
        return QuantConvStatic
    return QuantConv


def calibrate(module, variables, sample_inputs, jit: bool = False,
              **apply_kw):
    """Collect per-layer activation abs-max over ``sample_inputs``.

    ``module`` must be built with ``quantized="calib"``.  Returns the
    ``calib`` collection to merge into the variables of a
    ``quantized="static"`` build of the same architecture (identical module
    paths — the quantization mode only changes compute).  ``jit=True``
    compiles the pass (eager per-op dispatch is prohibitive on remote
    backends)."""
    import jax

    def _apply(vs, x):
        return module.apply(vs, x, mutable=["calib"], **apply_kw)

    if jit:
        _apply = jax.jit(_apply)
    calib = None
    for x in sample_inputs:
        vs = dict(variables)
        vs.pop("calib", None)
        if calib is not None:
            vs["calib"] = calib
        _, upd = _apply(vs, x)
        calib = upd["calib"]
    return calib

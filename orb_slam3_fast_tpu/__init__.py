"""TPU-native visual / visual-inertial SLAM engine (JAX/XLA/Pallas/pjit).

Brand-new implementation of the full ORB-SLAM3 (FAST fork) capability set —
see SURVEY.md for the blueprint and reference citations.
"""
import jax as _jax

# SLAM geometry lives in many small (3x3, 6x6) matmuls whose bf16 MXU default
# precision breaks rotation orthonormality (~5e-3 error per compose).  Default
# to full f32 matmuls; throughput-critical integer/bf16 kernels (descriptor
# Hamming matmuls, image convs) opt in explicitly via preferred_element_type /
# per-op precision.
_jax.config.update("jax_default_matmul_precision", "highest")

__version__ = "0.1.0"

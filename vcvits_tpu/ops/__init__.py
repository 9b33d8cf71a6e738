from vcvits_tpu.ops.fused_gate import fused_add_tanh_sigmoid_multiply  # noqa: F401

from rtdsd_tpu.ops.pallas.gat import fused_gat_aggregate  # noqa: F401

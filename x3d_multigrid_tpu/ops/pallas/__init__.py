from x3d_multigrid_tpu.ops.pallas.dw_conv3d import dw_conv3d_pallas

__all__ = ["dw_conv3d_pallas"]

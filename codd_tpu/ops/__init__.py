"""Core tensor ops: sampling, warps, SE(3), projection, GN solve,
correlation, splatting, upsampling, metrics."""

from .grid_sample import grid_sample, gather_pixels
from .warp import meshgrid_xy, flow_warp, disp_warp
from . import se3
from .projective import project, inv_project, projective_transform, induced_flow
from .gn import gn_step, cholesky_solve_small, grad_clip
from .corr import build_corr_pyramid, corr_lookup
from .splat import splat_render
from .upsample import (
    cvx_upsample, upsample_se3, to_plane, hyp_upsample, pixel_unshuffle,
    interpolate_nearest, interpolate_bilinear, unfold3x3,
)
from .metrics import masked_mean, epe_metric, thres_metric, t_epe_metric

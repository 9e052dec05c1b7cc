from . import blur, contrast, optim, scatter, warp_local

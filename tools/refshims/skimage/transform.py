def pyramid_expand(image, upscale=2, channel_axis=None):
    import numpy as np, sys
    sys.path.insert(0, "/root/repo")
    from event_based_optical_flow_tpu.ops.interp import pyramid_expand as pe
    return pe(np.asarray(image), upscale)

def pyramid_reduce(image, downscale=2, channel_axis=None):
    import numpy as np, sys
    sys.path.insert(0, "/root/repo")
    from event_based_optical_flow_tpu.ops.interp import pyramid_reduce as pr
    return pr(np.asarray(image), downscale)

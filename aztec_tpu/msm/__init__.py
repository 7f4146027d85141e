from .pippenger import msm, MSMConfig

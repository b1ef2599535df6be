from . import sampler
from .sampler import (ClusterSamplerPop, ClusterSamplerUniform, LSHSampler,
                      MaskedUniformSampler, MIDXSamplerPop, MIDXSamplerUniform,
                      PopularSamplerModel, RetrieverSampler, Sampler,
                      UniformSampler)

__all__ = [
    "sampler", "Sampler", "UniformSampler", "MaskedUniformSampler",
    "PopularSamplerModel", "MIDXSamplerUniform", "MIDXSamplerPop",
    "ClusterSamplerUniform", "ClusterSamplerPop", "LSHSampler",
    "RetrieverSampler",
]

"""JACS data-service client (cmd/jacsdata/*.java counterpart)."""

from .client import (CachedDataHelper, CDMIPBody, CDMIPSample, ColorDepthMIP,
                     JacsClient, em_neuron_from_mip, lm_neuron_from_mip)

__all__ = ["JacsClient", "ColorDepthMIP", "CDMIPSample", "CDMIPBody",
           "CachedDataHelper", "em_neuron_from_mip", "lm_neuron_from_mip"]

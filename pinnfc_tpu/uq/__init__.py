from pinnfc_tpu.uq.mc_dropout import MCSamples, mc_dropout_samples, mc_dropout_samples_loop

__all__ = ["MCSamples", "mc_dropout_samples", "mc_dropout_samples_loop"]

"""Shim of the `bicycleparameters` package API used by the reference
(Meijaard-2007 parameter set + linearized model). The physics comes from
our own validated implementation in cyclistsocialforce_tpu.ops.whipple."""

from pinnfc_tpu.physics import constants
from pinnfc_tpu.physics.voltage import voltage_residual, VoltageOutputs
from pinnfc_tpu.physics.thermal import (
    thermal_residual_simple,
    thermal_residual_euler,
    ThermalOutputs,
)
from pinnfc_tpu.physics.hydrogen import hydrogen_residual, StoichOutputs
from pinnfc_tpu.physics.oxygen import oxygen_residual
from pinnfc_tpu.physics.residuals import all_residuals, ResidualBundle

__all__ = [
    "constants",
    "voltage_residual",
    "VoltageOutputs",
    "thermal_residual_simple",
    "thermal_residual_euler",
    "ThermalOutputs",
    "hydrogen_residual",
    "oxygen_residual",
    "StoichOutputs",
    "all_residuals",
    "ResidualBundle",
]

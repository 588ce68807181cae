"""Physical constants of the 5-cell PEM stack models.

Values are exactly the reference's (net_f_V 01:729-750, net_f_H 01:633-664,
net_f_O 01:546-550, net_f_T 01:785-798)."""

A_CELL = 270.0  # active area [cm²]
N_CELLS = 5.0  # cells in the stack
F_CONST = 96485.0  # Faraday constant [C/mol]
R_GAS = 8.314  # gas constant [J/(mol·K)]
V_MOLAR_STP = 22.4  # molar volume at STP [L/mol]
O2_FRACTION = 0.21  # oxygen fraction of air
ALPHA = 0.5  # charge-transfer coefficient
GF_LIQ = -220170.0  # Gibbs free energy, liquid water [J/mol]
TC_REF = 55.0  # reference cell temperature for saturation pressure [°C]
KELVIN = 273.15

# Thermal Euler model constants (01:794-798).
CP_COOLANT = 4180.0  # [J/(kg·K)]
DT_EULER = 0.1  # Euler step [s]
H_AIR = 20.0  # air convection coefficient [W/(m²·K)]
A_SURFACE = 0.2  # radiating surface [m²]
T_AMBIENT = 25.0  # [°C]

# Current normalization base in the stoichiometry target models (01:581, 01:690).
I_NORM_BASE = 100.0


def saturation_pressure() -> float:
    """Cubic saturation-pressure polynomial at Tc = 55 °C (01:752-753).
    Constant because the reference evaluates it at the fixed Tc, not at the
    measured temperature."""
    x = (
        -2.1794
        + 0.02953 * TC_REF
        - 9.1837e-5 * TC_REF**2
        + 1.4454e-7 * TC_REF**3
    )
    return 10.0**x

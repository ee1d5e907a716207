from .base import SREnvironmentBase, ControlEnvironmentBase
from .sr_envs import LotkaVolterra, LorenzAttractor, VanDerPolOscillator
from .control_envs import (
    HarmonicOscillator,
    ChangingHarmonicOscillator,
    HarmonicOscillator2,
    CartPole,
    Acrobot,
    Acrobot2,
    StirredTankReactor,
)

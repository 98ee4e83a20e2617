from .env import Environment, EnvState, TimeStep, OBS_KEY
from . import spaces

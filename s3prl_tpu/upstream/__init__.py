from .base import Upstream, standardize_hidden_states
from . import registry
from . import aliases  # hubconf name-parity entries on top of the registry

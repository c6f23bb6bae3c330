from .base import Upstream, standardize_hidden_states
from . import registry

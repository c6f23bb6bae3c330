from .config import deep_merge, parse_overrides, load_yaml, dump_yaml
from .seed import fix_random_seeds, KeySeq
from .benchmark import benchmark

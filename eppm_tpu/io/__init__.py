from .ppm import read_ppm, write_ppm
from .flo import read_flo, write_flo

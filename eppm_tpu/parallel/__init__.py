from .halo import halo_exchange_1d, halo_exchange_2d
from .sharded import check_tileable, compute_flow_sharded, make_mesh

from .net import init_net, forward, NetOutput
from . import losses

__all__ = ["init_net", "forward", "NetOutput", "losses"]

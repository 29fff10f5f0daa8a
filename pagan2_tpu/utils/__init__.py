from .log import log_out, set_noise, get_noise
from .fetch import fetch_np

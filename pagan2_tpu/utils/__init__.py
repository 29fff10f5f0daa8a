from .log import (log_out, log_progress, finish_progress, set_noise,
                  get_noise)
from .fetch import fetch_np

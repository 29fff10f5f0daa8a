from .executor import (PairJob, execute_pair_jobs, make_jobs_mesh,
                       prepare_job, EXEC_STATS, reset_stats)

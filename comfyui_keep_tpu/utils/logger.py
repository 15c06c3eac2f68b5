"""Logging & timing (reference wm_basicsr/utils/logger.py): AvgTimer,
MessageLogger with ETA, cached rank-0 root logger, env banner."""
import datetime
import logging
import time
from typing import Dict, Optional

_loggers = {}


def get_root_logger(logger_name="comfyui_keep_tpu", log_level=logging.INFO,
                    log_file: Optional[str] = None):
    if logger_name in _loggers:
        return _loggers[logger_name]
    logger = logging.getLogger(logger_name)
    fmt = logging.Formatter("%(asctime)s %(levelname)s: %(message)s")
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    logger.propagate = False
    rank = 0
    try:
        import jax
        rank = jax.process_index()
    except Exception:
        pass
    if rank != 0:
        logger.setLevel("ERROR")
    else:
        logger.setLevel(log_level)
        if log_file is not None:
            fh = logging.FileHandler(log_file, "w")
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    _loggers[logger_name] = logger
    return logger


def master_only(func):
    """Rank-0-only decorator (reference utils/dist_util.py:74-82)."""
    import functools

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        rank = 0
        try:
            import jax
            rank = jax.process_index()
        except Exception:
            pass
        if rank == 0:
            return func(*args, **kwargs)

    return wrapper


class AvgTimer:
    """Average iter/data timing (logger.py:10-42)."""

    def __init__(self, window=200):
        self.window = window
        self.current_time = 0
        self.total_time = 0
        self.count = 0
        self.avg_time = 0
        self.start()

    def start(self):
        self.start_time = self.tic = time.time()

    def record(self):
        self.count += 1
        self.toc = time.time()
        self.current_time = self.toc - self.tic
        self.total_time += self.current_time
        self.avg_time = self.total_time / self.count
        if self.count > self.window:
            self.count = 0
            self.total_time = 0
        self.tic = time.time()

    def get_current_time(self):
        return self.current_time

    def get_avg_time(self):
        return self.avg_time


class MessageLogger:
    """epoch/iter/lr/time/eta + loss formatting (logger.py:45-117); mirrors
    scalars to tensorboard when a writer is given."""

    def __init__(self, opt: Dict, start_iter=1, tb_logger=None):
        self.exp_name = opt.get("name", "exp")
        logger_opt = opt.get("logger", {})
        self.interval = logger_opt.get("print_freq", 100)
        self.start_iter = start_iter
        self.max_iters = opt.get("train", {}).get("total_iter", 0)
        self.use_tb_logger = logger_opt.get("use_tb_logger", False)
        self.tb_logger = tb_logger
        self.start_time = time.time()
        self.logger = get_root_logger()

    def reset_start_time(self):
        self.start_time = time.time()

    def __call__(self, log_vars: Dict):
        current_iter = log_vars.pop("iter")
        epoch = log_vars.pop("epoch", 0)
        lrs = log_vars.pop("lrs", [])
        message = (f"[{self.exp_name[:31]}..][epoch:{epoch:3d}, "
                   f"iter:{current_iter:8,d}, lr:(")
        message += ", ".join(f"{v:.3e}" for v in lrs) + ")] "
        if "time" in log_vars:
            iter_time = log_vars.pop("time")
            data_time = log_vars.pop("data_time", 0)
            total_time = time.time() - self.start_time
            time_sec_avg = total_time / max(current_iter - self.start_iter + 1, 1)
            eta_sec = time_sec_avg * (self.max_iters - current_iter - 1)
            eta_str = str(datetime.timedelta(seconds=int(max(eta_sec, 0))))
            message += (f"[eta: {eta_str}, time (data): "
                        f"{iter_time:.3f} ({data_time:.3f})] ")
        for k, v in log_vars.items():
            message += f"{k}: {v:.4e} "
            if self.tb_logger is not None:
                self.tb_logger.add_scalar(
                    f"losses/{k}" if k.startswith("l_") else k, v, current_iter)
        self.logger.info(message)


def get_env_info():
    import sys
    try:
        import jax
        jv = jax.__version__
        devs = [str(d) for d in jax.devices()]
    except Exception:  # pragma: no cover
        jv, devs = "unavailable", []
    from comfyui_keep_tpu import __version__
    return (f"\n\tcomfyui_keep_tpu: {__version__}"
            f"\n\tPython: {sys.version.split()[0]}"
            f"\n\tJAX: {jv}\n\tDevices: {devs}")


@master_only
def init_tb_logger(log_dir):
    """TensorBoard writer (reference utils/logger.py:118-122). Uses torch's
    SummaryWriter when available, else tensorboardX, else raises."""
    try:
        from torch.utils.tensorboard import SummaryWriter
    except Exception:  # pragma: no cover
        from tensorboardX import SummaryWriter
    return SummaryWriter(log_dir=log_dir)


@master_only
def init_wandb_logger(opt):
    """wandb sync of the tb log (reference utils/logger.py:125-146); no-op
    import guard since wandb is optional in this image."""
    import wandb  # noqa: F401 — raises cleanly if unavailable
    logger = get_root_logger()
    project = opt["logger"]["wandb"]["project"]
    resume_id = opt["logger"]["wandb"].get("resume_id")
    if resume_id:
        wandb_id, resume = resume_id, "allow"
        logger.warning(f"Resume wandb logger with id={wandb_id}.")
    else:
        wandb_id, resume = wandb.util.generate_id(), "never"
    wandb.init(id=wandb_id, resume=resume, name=opt["name"],
               config=opt, project=project, sync_tensorboard=True)
    logger.info(f"Use wandb logger with id={wandb_id}; project={project}.")

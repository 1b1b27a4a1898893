"""Subprocess vectorized env pool.

Replaces the reference's tianshou ``SubprocVectorEnv`` usage
(``robomimic/scripts/train.py:141-144``): N env workers in their own
processes (MuJoCo stepping is CPU-bound and serial per env), stepped in
lockstep from the rollout loop. Batching env steps amortizes the single
host<->device round trip per policy query.
"""

import multiprocessing as mp

import numpy as np


def _worker(remote, parent_remote, env_fn):
    parent_remote.close()
    env = env_fn()
    try:
        while True:
            cmd, data = remote.recv()
            if cmd == "step":
                remote.send(env.step(data))
            elif cmd == "reset":
                remote.send(env.reset())
            elif cmd == "reset_to":
                remote.send(env.reset_to(data))
            elif cmd == "is_success":
                remote.send(env.is_success())
            elif cmd == "render":
                remote.send(env.render(**data))
            elif cmd == "getattr":
                remote.send(getattr(env, data, None))
            elif cmd == "call":
                name, args, kwargs = data
                remote.send(getattr(env, name)(*args, **kwargs))
            elif cmd == "close":
                remote.close()
                break
    except (KeyboardInterrupt, EOFError):
        pass


class SubprocVectorEnv:
    """Lockstep pool of env subprocesses."""

    def __init__(self, env_fns, context="fork"):
        ctx = mp.get_context(context)
        self.n = len(env_fns)
        self.remotes, work_remotes = zip(*[ctx.Pipe() for _ in range(self.n)])
        self.procs = []
        for remote, work_remote, fn in zip(self.remotes, work_remotes, env_fns):
            p = ctx.Process(
                target=_worker, args=(work_remote, remote, fn), daemon=True
            )
            p.start()
            work_remote.close()
            self.procs.append(p)
        self._closed = False

    def __len__(self):
        return self.n

    def _send_all(self, cmd, datas=None):
        if datas is None:
            datas = [None] * self.n
        for remote, data in zip(self.remotes, datas):
            remote.send((cmd, data))
        return [remote.recv() for remote in self.remotes]

    def reset(self, ids=None):
        if ids is None:
            return self._send_all("reset")
        for i in ids:
            self.remotes[i].send(("reset", None))
        return [self.remotes[i].recv() for i in ids]

    def reset_to(self, states):
        return self._send_all("reset_to", states)

    def step(self, actions):
        """actions: [N, A] -> lists of (obs, reward, done, info)."""
        results = self._send_all("step", list(np.asarray(actions)))
        obs, rews, dones, infos = zip(*results)
        return list(obs), np.asarray(rews), np.asarray(dones), list(infos)

    def is_success(self):
        return self._send_all("is_success")

    def render(self, **kwargs):
        return self._send_all("render", [kwargs] * self.n)

    def get_env_attr(self, name):
        return self._send_all("getattr", [name] * self.n)

    def call(self, name, *args, **kwargs):
        return self._send_all("call", [(name, args, kwargs)] * self.n)

    def close(self):
        if self._closed:
            return
        for remote in self.remotes:
            try:
                remote.send(("close", None))
            except BrokenPipeError:
                pass
        for p in self.procs:
            p.join(timeout=5)
            if p.is_alive():
                p.terminate()
        self._closed = True

    def __del__(self):
        self.close()

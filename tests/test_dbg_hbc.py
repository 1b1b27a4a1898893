import sys, os
sys.path.insert(0, os.path.dirname(__file__))
import numpy as np, torch, jax, jax.numpy as jnp
import test_hbc_parity as T
from test_hbc_parity import algo_pair

def test_dbg(algo_pair):
    ref, ours = algo_pair
    T._sync(ref, ours)
    ref.set_eval()
    raw = T.make_raw_batch(1)
    rinfo = ref.train_on_batch(ref.process_batch_for_training(T._to_torch(raw)), epoch=1, validate=True)
    print('planner info keys', list(rinfo['planner'].keys()))
    print('actor info keys', list(rinfo['actor'].keys()))
    pb = ours.process_batch_for_training(raw)
    print('ours actor batch keys', list(pb['actor'].keys()), 'goal', type(pb['actor'].get('goal_obs')))
    oinfo = ours.train_on_batch(pb, epoch=1, validate=True)
    print('ours planner keys', list(oinfo['planner'].keys()))
    print('ours actor keys', list(oinfo['actor'].keys()))

#!/bin/bash
# r20 tasks: 1000x inc-family battery (r19 verdict #5), DeleteSoak
# minhash arm at 100x on the bijected corpus (#8), pointer churn race on
# the latency-shaped mock (#9)
cd /root/repo
echo "=== inc family 1000x start $(date) ==="   > /root/repo/soak_r20.log
GRAFT_SOAK_TEARDOWN=1 GRAFT_SOAK_SEED_CHUNKS=8 GRAFT_SOAK_ONLY=inc \
  sbt -batch "Test/runMain graft.Soak /root/testdata/sf0.1 1000" >> /root/repo/soak_r20.log 2>&1
echo "=== inc done, DeleteSoak minhash 100x start $(date) ===" >> /root/repo/soak_r20.log
GRAFT_SOAK_STORES=exact,minhash,pointer \
  sbt -batch "Test/runMain graft.DeleteSoak /root/testdata/sf0.1 100" >> /root/repo/soak_r20.log 2>&1
echo "=== delete done, latency-mock ptr churn 100x start $(date) ===" >> /root/repo/soak_r20.log
GRAFT_SOAK_ONLY=ptr GRAFT_SOAK_MOCK_LATENCY=put=25,list=50 \
  sbt -batch "Test/runMain graft.Soak /root/testdata/sf0.1 100" >> /root/repo/soak_r20.log 2>&1
echo "=== all done $(date) ===" >> /root/repo/soak_r20.log

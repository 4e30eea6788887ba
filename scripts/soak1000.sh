#!/bin/bash
# r18 task: push the hot-family soaks to 1000x (r17 verdict #3)
cd /root/repo
echo "=== inc family 1000x start $(date) ==="   > /root/repo/soak1000.log
GRAFT_SOAK_ONLY=inc  sbt -batch "Test/runMain graft.Soak /root/testdata/sf0.1 1000" >> /root/repo/soak1000.log 2>&1
echo "=== inc done, text family 1000x start $(date) ===" >> /root/repo/soak1000.log
GRAFT_SOAK_ONLY=text sbt -batch "Test/runMain graft.Soak /root/testdata/sf0.1 1000" >> /root/repo/soak1000.log 2>&1
echo "=== text done, DeleteSoak 1000x start $(date) ===" >> /root/repo/soak1000.log
sbt -batch "Test/runMain graft.DeleteSoak /root/testdata/sf0.1 1000" >> /root/repo/soak1000.log 2>&1
echo "=== all done $(date) ===" >> /root/repo/soak1000.log

package com.ibm.mq;

import java.util.Hashtable;

import com.ibm.mq.constants.CMQC;

/**
 * OFFLINE COMPILE-CHECK STUB — see {@link MQException} header.
 *
 * The constructor models the one thing that is true offline: there is
 * no broker. It throws {@link MQException} with
 * {@code MQRC_HOST_NOT_AVAILABLE} (2538), the same failure shape a
 * real client raises when the listener is unreachable — so an adapter
 * compiled against the stubs fails CLEANLY at connect time (a typed
 * MQException a caller/retry wrapper already handles), never deep in
 * a half-connected state.
 */
public class MQQueueManager {
    public MQQueueManager(String name, Hashtable<String, Object> props)
            throws MQException {
        throw new MQException(2, CMQC.MQRC_HOST_NOT_AVAILABLE,
            "offline API stub: no queue manager '" + name + "' reachable");
    }

    public MQQueue accessQueue(String name, int openOptions) throws MQException {
        throw new UnsupportedOperationException("offline API stub");
    }

    public void commit() throws MQException {
        throw new UnsupportedOperationException("offline API stub");
    }

    public void backout() throws MQException {
        throw new UnsupportedOperationException("offline API stub");
    }

    public void disconnect() throws MQException {
        throw new UnsupportedOperationException("offline API stub");
    }
}

package com.ibm.mq;

/** OFFLINE COMPILE-CHECK STUB — see {@link MQException} header. */
public class MQQueue {
    MQQueue() {}

    public void get(MQMessage msg, MQGetMessageOptions gmo) throws MQException {
        throw new UnsupportedOperationException("offline API stub");
    }

    public void put(MQMessage msg, MQPutMessageOptions pmo) throws MQException {
        throw new UnsupportedOperationException("offline API stub");
    }

    public int getCurrentDepth() throws MQException {
        throw new UnsupportedOperationException("offline API stub");
    }

    public int getInhibitGet() throws MQException {
        throw new UnsupportedOperationException("offline API stub");
    }

    public void close() throws MQException {
        throw new UnsupportedOperationException("offline API stub");
    }
}
